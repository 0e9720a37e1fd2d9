from tst.runtime.platform import select_platform  # noqa: F401
