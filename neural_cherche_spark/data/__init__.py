from neural_cherche_spark.data.synth import synth_queries, synth_webtext  # noqa: F401
