"""Per-domain query-spec modules.

IMPORT ORDER IS THE REGISTRATION ORDER: each module below registers its
specs into :data:`flink_snappydata_spark.specs.base.QUERIES` at import
time, and :mod:`flink_snappydata_spark.registry` reorders only the
driver-priority window (``_HEAD`` + queue) on top of this sequence —
everything not named there keeps the order established here. Do not
alphabetize these imports; ``tests/test_oracle_parity.py`` pins the
resulting declaration order as a golden list.
"""

from flink_snappydata_spark.specs.base import (  # noqa: F401
    QUERIES,
    QueryFn,
    QuerySpec,
)

# fmt: off
from flink_snappydata_spark.specs import tpch  # noqa: F401,E402
from flink_snappydata_spark.specs import aggregation  # noqa: F401,E402
from flink_snappydata_spark.specs import wordcount  # noqa: F401,E402
from flink_snappydata_spark.specs import joins  # noqa: F401,E402
from flink_snappydata_spark.specs import sorts_sets  # noqa: F401,E402
from flink_snappydata_spark.specs import analytic_windows  # noqa: F401,E402
from flink_snappydata_spark.specs import scalar_functions  # noqa: F401,E402
from flink_snappydata_spark.specs import streaming_ops  # noqa: F401,E402
from flink_snappydata_spark.specs import llm_pipeline  # noqa: F401,E402
from flink_snappydata_spark.specs import shards_text  # noqa: F401,E402
from flink_snappydata_spark.specs import embeddings_quality  # noqa: F401,E402
from flink_snappydata_spark.specs import olap_events  # noqa: F401,E402
from flink_snappydata_spark.specs import profiling_analytics  # noqa: F401,E402
# fmt: on
