from tst.train.sft import FoldTrainer, make_fold_batches  # noqa: F401
from tst.train.infer import score_heldout_mcq  # noqa: F401
