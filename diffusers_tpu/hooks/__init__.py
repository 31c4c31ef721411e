from .faster_cache import (
    FasterCacheConfig,
    FasterCacheState,
    faster_cache_apply,
    faster_cache_schedules,
    init_faster_cache_state,
)
from .first_block_cache import FBCState, FirstBlockCacheConfig, flux_forward_with_fbc, init_fbc_state
from .taylorseer import (
    TaylorSeerCacheConfig,
    TaylorSeerState,
    init_taylorseer_state,
    taylorseer_apply,
    taylorseer_compute_mask,
)
