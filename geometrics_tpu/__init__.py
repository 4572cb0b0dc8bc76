"""geometrics_tpu — TPU-native single-image 3D mesh reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EdwardSmith1884/GEOMetrics (ICML 2019).  See README.md for the architecture
map and SURVEY.md for the reference analysis this was built against.
"""

__version__ = "0.1.0"

# Subpackages (core/data/models/ops/parallel/train/utils/native) are imported
# explicitly by users; nothing heavy is pulled in at package import.
