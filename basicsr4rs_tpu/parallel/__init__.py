from .mesh import batch_spec, create_mesh, make_batch_put_fn, replicate, shard_batch

__all__ = ['batch_spec', 'create_mesh', 'make_batch_put_fn', 'replicate', 'shard_batch']
