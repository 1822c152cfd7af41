from rovit_kan_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
