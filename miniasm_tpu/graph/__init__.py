# submodules are imported explicitly (miniasm_tpu.graph.asg etc.);
# keeping this empty lets the numpy-only modules (asg, finalize_native)
# load without pulling jax — the sanitizer driver depends on that
