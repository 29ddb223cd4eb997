"""rmem_ocu_tpu — a TPU-native (JAX/XLA/Pallas) restricted-memory VOS framework.

Re-implements the capabilities of the RMem (AOT/DeAOT lineage) reference
(`Bardli/RMem_ocu`) with a TPU-first architecture:

- pure-functional inference engines over a static-capacity, device-resident
  memory ring buffer (reference: mutable python lists + torch.cat growth,
  aot_plus/networks/layers/transformer.py:306-436),
- a fused memory-read attention that also emits the eviction scores
  (reference: explicit softmax weights, attention.py:45-64),
- pjit/shard_map data parallelism over a jax.sharding.Mesh (reference:
  DDP + gloo, networks/managers/trainer.py:94-113).
"""

__version__ = "0.1.0"

from rmem_ocu_tpu.config import get_config  # noqa: F401
