"""Entry-point package: installed as `walk_these_ways_tpu.scripts` via the
package-dir mapping in pyproject.toml, while remaining directly runnable
from a checkout (`python scripts/train.py`)."""
