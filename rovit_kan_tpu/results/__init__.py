from rovit_kan_tpu.results.logger import ExperimentLogger  # noqa: F401
