from rmem_ocu_tpu.config.defaults import (  # noqa: F401
    ExpConfig,
    ModelConfig,
    get_config,
    get_model_config,
    MODEL_REGISTRY,
    STAGE_REGISTRY,
)
