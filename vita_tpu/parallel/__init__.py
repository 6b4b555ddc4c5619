from vita_tpu.parallel.mesh import AXES, DATA, EXPERT, FSDP, MODEL, PIPE, make_mesh, shard
