"""Contract query modules (SURVEY.md §2.B).  Importing this package
registers every query into :mod:`datastore_mapper_spark.registry`."""

from . import scans  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import windows  # noqa: F401
from . import setops  # noqa: F401
from . import functions_suite  # noqa: F401
from . import stream_batch  # noqa: F401
from . import llm_text  # noqa: F401
from . import llm_vector  # noqa: F401
from . import udfs  # noqa: F401
from . import sinks_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import llm_extra  # noqa: F401
from . import relational_extra  # noqa: F401
from . import mapper_queries  # noqa: F401
from . import relational_extra2  # noqa: F401
from . import relational_extra3  # noqa: F401
from . import tpch_style  # noqa: F401
from . import pipeline_extra  # noqa: F401
from . import relational_extra4  # noqa: F401
from . import relational_extra5  # noqa: F401
from . import udtf_queries  # noqa: F401
from . import relational_extra6  # noqa: F401
from . import relational_extra7  # noqa: F401
from . import scale_queries  # noqa: F401
