from columbiaimagesearch_tpu.parallel.mesh import make_mesh, shard_rows
from columbiaimagesearch_tpu.parallel.sharded import (
    dp_lloyd_step,
    dp_encode,
    ShardedLOPQIndex,
)
