from .mesh import item_mesh, sharded_hist_pipeline, shard_pairs  # noqa: F401
