from rmem_ocu_tpu.engine.infer_engine import (  # noqa: F401
    EngineState,
    InferEngine,
)
