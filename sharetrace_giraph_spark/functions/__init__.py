from .scalars import (  # noqa: F401
    coarsen,
    drop_if_empty,
    duration_between_s,
    epoch_millis,
    from_epoch_millis,
    max_score,
    recency_filter,
    score_order,
    sender_exclusion,
    superstep_phase,
    transmission_gate,
)
