from rmem_ocu_tpu.parallel.tp import (shard_params, state_shardings,
                                      tp_param_spec)

__all__ = ['shard_params', 'state_shardings', 'tp_param_spec']
