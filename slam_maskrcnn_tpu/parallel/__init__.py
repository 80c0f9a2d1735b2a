from slam_maskrcnn_tpu.parallel.sharding import (data_parallel_sharding,
                                                 make_mesh,
                                                 shard_batch,
                                                 shard_params,
                                                 shard_volume_state)
