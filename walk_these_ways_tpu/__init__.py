"""walk_these_ways_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the
walk-these-ways quadruped sim-to-real RL stack."""

__version__ = "0.1.0"
