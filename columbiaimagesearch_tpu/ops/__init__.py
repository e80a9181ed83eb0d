from columbiaimagesearch_tpu.ops.eigen_alloc import (
    eigenvalue_allocation,
    eigenvalue_allocation_batch,
)
from columbiaimagesearch_tpu.ops.kmeans import (
    assign_clusters,
    kmeans_plusplus_init,
    lloyd_kmeans,
    fit_kmeans,
)
from columbiaimagesearch_tpu.ops.pca import train_pca
