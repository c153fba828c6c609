"""Smoke tests for the example scripts (tiny configs, CPU)."""
import sys
import numpy as np
import pytest


def run_main(module_path, argv):
    import importlib.util
    spec = importlib.util.spec_from_file_location("ex_mod", module_path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = [module_path] + argv
    try:
        spec.loader.exec_module(mod)
        if hasattr(mod, "main"):
            mod.main()
    finally:
        sys.argv = old


def test_enwik8_example_tiny():
    run_main("examples/enwik8.py",
             ["--n_iter", "2", "--n_batch", "2", "--n_ctx", "128",
              "--n_embd", "64", "--n_layer", "1", "--n_head", "2",
              "--blk_size", "32"])


def test_lstm_example_tiny():
    run_main("examples/lstm_train.py",
             ["--n_iter", "2", "--nhidden", "128", "--batch", "4",
              "--nsteps", "8", "--mask_kind", "ba_2"])


def test_mnist_example_tiny():
    run_main("examples/mnist.py", ["--n_iter", "3", "--batch", "32"])
