"""Query catalog: every operator class from SURVEY §2 declared as a named
(spark_fn, oracle_sql) pair over the driver's TESTDATA tables.

Import side effects register the queries; ``registry()`` returns them.
"""

from .catalog import CatalogQuery, load, register, registry  # noqa: F401
from . import relational  # noqa: F401  (registers on import)
from . import pipeline_queries  # noqa: F401
from . import retrieval_queries  # noqa: F401
from . import advanced  # noqa: F401
from . import python_ops  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import extras  # noqa: F401  (round 11; MUST stay last — first-50 pin)
