"""Incremental batch analytics runner."""

from .enrich import (  # noqa: F401
    EnrichmentJoinJob,
    recover_skew_report,
    report_exists,
    refresh_skew_report,
    run_enriched_incremental,
)
from .cc import (  # noqa: F401
    forget_ids_from_cc_store,
    read_cc_labels,
    update_cc_store,
)
from .forget import forget_ids_from_store  # noqa: F401
from .joinview import (  # noqa: F401
    JoinViewSpec,
    compact_join_view,
    forget_left_ids_from_join_view,
    forget_right_ids_from_join_view,
    read_join_side,
    read_join_view,
    read_join_view_delta,
    recover_pending_forgets,
    update_join_view,
)
from .joinview_cdc import (  # noqa: F401
    compact_join_view_cdc,
    forget_left_ids_from_cdc_view,
    forget_right_ids_from_cdc_view,
    read_current_side,
    read_join_view_cdc,
    read_join_view_cdc_delta,
    update_join_view_cdc,
    verify_cdc_side,
)
from .rollup import (  # noqa: F401
    compact_rollup_store,
    forget_user_from_rollup,
    read_rollup,
    read_rollup_grain,
    update_rollup_store,
)
from .rollup_cdc import (  # noqa: F401
    compact_cdc_rollup,
    read_cdc_rollup,
    update_cdc_rollup,
)
from .runner import IncrementalJob, run_incremental  # noqa: F401
