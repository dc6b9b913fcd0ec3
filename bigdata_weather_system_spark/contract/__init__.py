"""Driver-contract registry (queries + DuckDB oracles), split by family.

Importing this package registers every query module into the shared
``QUERIES`` / ``ORACLES`` dicts defined in ``core``.
"""

from .core import QUERIES, ORACLES, register, queries, oracle_sql  # noqa: F401

# Register the remaining families (import order = registration order).
from . import windows_setops  # noqa: F401, E402
from . import scalars_grouping  # noqa: F401, E402
from . import relational_ext  # noqa: F401, E402
from . import llm_ops  # noqa: F401, E402
from . import tpch_more  # noqa: F401, E402
from . import tpch_partsupp  # noqa: F401, E402
from . import analytics_ext  # noqa: F401, E402
from . import pipeline_ops  # noqa: F401, E402
from . import sketch_ops  # noqa: F401, E402
from . import cleaning_ops  # noqa: F401, E402
from . import cdc_ext  # noqa: F401, E402
from . import graph_ops  # noqa: F401, E402
from . import recommend_ops  # noqa: F401, E402
from . import geo_ops  # noqa: F401, E402
from . import warehouse_ops  # noqa: F401, E402
from . import pca_ops  # noqa: F401, E402
from . import eval_ops  # noqa: F401, E402
from . import causal_stats_ext  # noqa: F401, E402
from . import layout_ops  # noqa: F401, E402
from . import attribution_ops  # noqa: F401, E402
from . import diagnostics_ops  # noqa: F401, E402
from . import labeling_ops  # noqa: F401, E402
from . import training_ops  # noqa: F401, E402
from . import web_ops  # noqa: F401, E402
from . import curation_ops  # noqa: F401, E402

__all__ = ["QUERIES", "ORACLES", "register", "queries", "oracle_sql"]
