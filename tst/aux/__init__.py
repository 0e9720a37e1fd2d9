from tst.aux.log import JsonlLogger  # noqa: F401
