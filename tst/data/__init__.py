from tst.data.schema import Sample, BlindDataset  # noqa: F401
from tst.data.folds import kfold_assign  # noqa: F401
