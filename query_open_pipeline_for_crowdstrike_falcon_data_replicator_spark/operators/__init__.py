from .normalize import NORMALIZERS, normalize_class  # noqa: F401
