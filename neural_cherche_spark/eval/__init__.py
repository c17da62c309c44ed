from neural_cherche_spark.eval.metrics import evaluate_run  # noqa: F401
from neural_cherche_spark.eval.beir import evaluate, load_beir_dir  # noqa: F401
