from .densenet import DenseNet  # noqa: F401
