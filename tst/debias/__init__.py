from tst.debias.ibp import prune_mask, run_ibp  # noqa: F401
