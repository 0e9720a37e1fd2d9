from tst.io.outputs import write_debiased_split, write_report, write_sx_table  # noqa: F401
