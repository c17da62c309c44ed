from neural_cherche_spark.eval.metrics import evaluate_run  # noqa: F401
