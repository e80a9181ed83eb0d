from columbiaimagesearch_tpu.pipeline.ingest import (
    GenericIngester,
    GenericPusher,
    LocalDirIngester,
    MemoryBus,
    MemoryBusIngester,
    MemoryBusPusher,
)
from columbiaimagesearch_tpu.pipeline.checker import ExtractionChecker
from columbiaimagesearch_tpu.pipeline.processor import ExtractionProcessor
