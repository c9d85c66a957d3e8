"""Sources: readers for the engine's tables.

The reference dispatches ``/update`` payloads to per-format loaders
(``solr/core/src/java/org/apache/solr/handler/UpdateRequestHandler.java:
132-150`` → JsonLoader/CSVLoaderBase/XMLLoader...). Ray Data's native
readers play that role; these helpers add column pruning and the repo's
table conventions.
"""

from __future__ import annotations

import os


def load(sf_dir: str, table: str, columns: list[str] | None = None):
    """Read one test table as a Dataset, pruning columns at the read
    (row groups that don't contain the columns never leave storage)."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def load_arrow(sf_dir: str, table: str, columns: list[str] | None = None):
    """Small driver-side read (dimension tables, broadcast sides)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def read_csv(paths, **kw):
    import ray.data as rd

    return rd.read_csv(paths, **kw)


def read_json(paths, **kw):
    import ray.data as rd

    return rd.read_json(paths, **kw)


def read_text(paths, **kw):
    import ray.data as rd

    return rd.read_text(paths, **kw)


def read_xml_adds(paths, multivalued: frozenset[str] | set[str] = frozenset()):
    """XMLLoader analog (reference
    ``solr/core/src/java/org/apache/solr/handler/loader/XMLLoader.java``:
    ``<add><doc><field name="..">value</field>...`` update payloads).

    One parse task per file (``flat_map`` over the path list — each XML
    file is a shard, so a 10^6-file corpus parses embarrassingly
    parallel); ElementTree's C parser walks the docs. Every field value is
    a STRING (Solr's loader is schema-typed downstream — compose with the
    stages.urp Parse* type parsers, exactly like the reference's
    ParseIntFieldUpdateProcessor chain). Fields named in ``multivalued``
    collect repeated ``<field>`` occurrences into a list; for the rest,
    the last occurrence wins.
    """
    import ray.data as rd

    mv = frozenset(multivalued)

    def parse(row: dict) -> list[dict]:
        import xml.etree.ElementTree as ET

        root = ET.parse(row["path"]).getroot()
        if root.tag != "add":
            raise ValueError(f"expected <add> root, got <{root.tag}>")
        out = []
        for doc in root.iter("doc"):
            rec: dict = {m: [] for m in mv}
            for f in doc.iter("field"):
                name = f.attrib["name"]
                val = f.text if f.text is not None else ""
                if name in mv:
                    rec[name].append(val)
                else:
                    rec[name] = val
            out.append(rec)
        return out

    if isinstance(paths, str):
        paths = [paths]
    return rd.from_items([{"path": p} for p in paths]).flat_map(parse)


def write_xml_add(table, path: str) -> None:
    """Serialize an Arrow table as a Solr ``<add>`` update payload (the
    roundtrip partner of ``read_xml_adds``; values via str())."""
    import xml.sax.saxutils as sx

    cols = table.column_names
    with open(path, "w", encoding="utf-8") as f:
        f.write("<add>\n")
        for i in range(table.num_rows):
            f.write("  <doc>\n")
            for c in cols:
                v = table.column(c)[i].as_py()
                if v is None:
                    continue
                vals = v if isinstance(v, list) else [v]
                for one in vals:
                    f.write(f'    <field name="{c}">{sx.escape(str(one))}</field>\n')
            f.write("  </doc>\n")
        f.write("</add>\n")
