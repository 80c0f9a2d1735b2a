from slam_maskrcnn_tpu.parallel.sharding import (data_parallel_sharding,
                                                 make_mesh,
                                                 make_sharded_fusion_step,
                                                 make_sharded_render,
                                                 shard_batch,
                                                 shard_params,
                                                 shard_volume_state)
