from .mesh import make_mesh, episode_sharding, replicated  # noqa: F401
