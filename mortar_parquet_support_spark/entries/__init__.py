"""Entry registry package: importing it loads every family module,
which self-register into ``_registry._SPARK_FNS`` / ``_ORACLES``. The
driver-facing contract (entry / queries / oracle_sql) stays in
``__spark_entry__.py`` at the repo root."""

from ._registry import (  # noqa: F401
    _ORACLES,
    _SPARK_FNS,
    _register,
    _t,
    digest_index_for,
    ivf_index_for,
    ivf_index_rebuild,
    pq_index_for,
)

# import order mirrors the original file top-to-bottom so the registration
# (and therefore queries()) order is unchanged
from . import reference_surface  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_search  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_sampling  # noqa: E402,F401
from . import llm_quality  # noqa: E402,F401
from . import llm_events  # noqa: E402,F401
from . import rowsonly  # noqa: E402,F401
