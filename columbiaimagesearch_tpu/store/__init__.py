from columbiaimagesearch_tpu.store.kvindexer import KVIndexer
from columbiaimagesearch_tpu.store.storer import (
    GenericStorer,
    LocalStorer,
    MemoryStorer,
    get_storer,
)
