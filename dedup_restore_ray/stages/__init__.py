"""Ray Data stages: callable classes / functions for ``map_batches``,
band expansion, candidate-pair generation, verification, clustering,
substring pass, similarity search, multimodal plumbing.

Stage contract: Arrow in / Arrow out (``batch_format="pyarrow"``)
wherever the kernel allows zero-copy; stateful setup lives in actor
``__init__`` (SURVEY §7.2).
"""
