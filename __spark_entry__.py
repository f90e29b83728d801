"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG pipeline Stage A..E on the deterministic
                 synthetic transcript corpus (sf0.001-sized).
queries()      — one entry per implemented operator from SURVEY.md §2 plus
                 the training-data ops (dedup / ANN / text analysis /
                 multimodal / streaming), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB ANSI SQL for every SQL-checkable entry (same column
                 aliases as the Spark plans).
"""

from __future__ import annotations

import tempfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing these modules populates kgpipe.qreg.REGISTRY
import kgpipe.relational  # noqa: F401
import kgpipe.dedup  # noqa: F401
import kgpipe.ann  # noqa: F401
import kgpipe.textstats  # noqa: F401
import kgpipe.multimodal  # noqa: F401
import kgpipe.kgqueries  # noqa: F401
import kgpipe.curate  # noqa: F401
import kgpipe.streaming  # noqa: F401
import kgpipe.grouped  # noqa: F401
from kgpipe.qreg import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full Stage A..E KG-construction pipeline on the
    seeded synthetic transcript corpus; returns the final triple table."""
    from kgpipe import pipeline, schemas, synth

    c = synth.generate(n_convs=60)
    tdf = spark.createDataFrame(c.transcripts, schema=schemas.TRANSCRIPTS)
    edf = spark.createDataFrame(c.entity_dict, schema=schemas.ENTITY_DICT)
    wd = tempfile.mkdtemp(prefix="entry_")
    return pipeline.run_simple(spark, tdf, edf, wd, input_fingerprint="entry60")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
