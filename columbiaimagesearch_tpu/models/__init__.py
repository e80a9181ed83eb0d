from columbiaimagesearch_tpu.models.sentibank import (
    DeepSentibank,
    SentibankFeaturizer,
)
