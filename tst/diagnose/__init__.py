from tst.diagnose.score import ScoreRule, bias_scores  # noqa: F401
from tst.diagnose.rf import RFDiagnosis, run_rf_diagnostic  # noqa: F401
