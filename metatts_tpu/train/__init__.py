from .optim import make_optimizer, noam_schedule  # noqa: F401
