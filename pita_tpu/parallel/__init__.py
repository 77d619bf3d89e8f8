from pita_tpu.parallel.mesh import make_mesh, chain_sharding, replicated
from pita_tpu.parallel.sharded import (
    sharded_integrate,
    make_dp_train_step,
    shard_batch,
)
from pita_tpu.parallel.sharded_buffer import ShardedBufferOps
