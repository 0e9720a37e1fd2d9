from tst.eval.metrics import accuracy, blind_report, mra  # noqa: F401
