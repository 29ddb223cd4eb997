from rmem_ocu_tpu.memory.bank import (  # noqa: F401
    MemoryBank,
    ShortTermMemory,
    init_bank,
    append_frame,
    evict_frame,
    eviction_scores_and_update,
    default_drop_index,
)
