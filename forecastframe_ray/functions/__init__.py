from forecastframe_ray.functions import scalar, scalers, encoding, metrics

__all__ = ["scalar", "scalers", "encoding", "metrics"]
