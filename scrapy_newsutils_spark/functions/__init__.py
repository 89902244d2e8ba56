from . import hashing, images, text, urls  # noqa: F401
