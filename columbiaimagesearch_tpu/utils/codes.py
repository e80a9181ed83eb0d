"""Code dtype conventions.

The reference sizes cluster-id dtypes to the codebook cardinality
(reference: lopq/lopq/utils.py:33-53 ``predict_cluster``): uint8 for <=256
clusters, uint16 for <=65536, else uint32. We keep the same convention at the
host API boundary; on device everything is int32 (TPU-native integer width).
"""

import numpy as np


def code_dtype_for(num_clusters: int):
    if num_clusters <= 256:
        return np.uint8
    elif num_clusters <= 65536:
        return np.uint16
    return np.uint32
