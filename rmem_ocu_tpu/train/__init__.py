from rmem_ocu_tpu.train.trainer import Trainer, TrainState  # noqa: F401
