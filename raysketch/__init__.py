"""raysketch -- Ray-Data-native distributed probabilistic-structures engine.

A from-scratch re-expression of steelcake/filterz's capabilities
(membership filters: split-block Bloom / xor-binary-fuse / ribbon) extended
with mergeable sketches (HLL, count-min, KLL, t-digest) and large-scale
training-data operators (dedup, similarity search, text analysis), built on
ray.data.Dataset + zero-copy Arrow batches.  See SURVEY.md for the full
blueprint and per-operator reference citations.
"""

__version__ = "0.1.0"
