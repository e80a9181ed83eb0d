from columbiaimagesearch_tpu.index.model import LOPQModel, LOPQModelPCA, LOPQCode, train
from columbiaimagesearch_tpu.index.multisequence import multisequence
from columbiaimagesearch_tpu.index.searcher import LOPQSearcher, LOPQSearcherTPU
