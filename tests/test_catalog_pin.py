"""QUERIES.md staleness pin (round-4 verdict hygiene item): the generated
catalog doc must agree with the live ``queries()`` / ``oracle_sql()``
registries, and every oracle key must have a query entry."""

import re


def _entry_module():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_pin", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_queries_md_counts_match_registry():
    m = _entry_module()
    qs, oracles = m.queries(), m.oracle_sql()
    with open("/root/repo/QUERIES.md") as f:
        head = f.read(400)
    g = re.search(r"(\d+) entries; (\d+) with a full DuckDB value oracle",
                  head)
    assert g, "QUERIES.md header not recognized — regenerate via tools/catalog.py"
    assert (int(g.group(1)), int(g.group(2))) == (len(qs), len(oracles)), \
        "QUERIES.md is stale — run `python tools/catalog.py`"


def test_every_oracle_has_a_query():
    m = _entry_module()
    qs, oracles = m.queries(), m.oracle_sql()
    assert [k for k in oracles if k not in qs] == []
