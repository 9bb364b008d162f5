"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()`` — flagship KG pipeline (transcripts -> canonical triples) over
  deterministic synthetic transcripts at sf0.001 scale (the transcripts table
  shape is mandated by BASELINE.json input_hint and is synthesised seeded —
  /root/testdata has no transcripts table; documents/embeddings/events back
  the relational + corpus operators instead).
- ``queries()`` — one entry per implemented operator/pipeline from
  SURVEY.md §2 (Part B + corpus-pipeline ops), each taking ``sf_dir``.
- ``oracle_sql()`` — DuckDB twins for every SQL-expressible query (column
  names and rounding pinned on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver checks rows >= 0."""
    from ner_ray.pipelines.queries import kg_triples

    return kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ner_ray.pipelines.queries import RAY_QUERIES

    return dict(RAY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from ner_ray.pipelines.queries import oracle_sql_catalog

    return oracle_sql_catalog()
