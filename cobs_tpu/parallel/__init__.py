from cobs_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    make_mesh,
    scatter_step,
    score_seq_sharded,
    score_sharded,
    train_step,
)
