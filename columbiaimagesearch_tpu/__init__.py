"""columbiaimagesearch_tpu — a TPU-native image & face similarity-search framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ColumbiaDVMM/ColumbiaImageSearch (reference: /root/reference):

- LOPQ (Locally Optimized Product Quantization) training, encoding and
  asymmetric-distance search as batched XLA linear algebra and Pallas kernels
  (reference: lopq/lopq/model.py, lopq/lopq/search.py).
- DeepSentibank 4096-d image features and 128-d face embeddings as batched
  Flax models (reference: cufacesearch/featurizer/*).
- A batch-first extraction pipeline and a sharded, mesh-parallel serving
  index replacing the Kafka/HBase/Spark plumbing.
"""

__version__ = "0.1.0"

from columbiaimagesearch_tpu.index.model import LOPQModel, LOPQModelPCA, LOPQCode

__all__ = [
    "LOPQModel",
    "LOPQModelPCA",
    "LOPQCode",
]
