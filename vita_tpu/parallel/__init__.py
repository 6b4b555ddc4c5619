from vita_tpu.parallel.mesh import AXES, DATA, EXPERT, FSDP, MODEL, make_mesh, shard
