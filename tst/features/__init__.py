from tst.features.featurize import FeatureMatrix, featurize  # noqa: F401
from tst.features.forest import RandomForest  # noqa: F401
