from columbiaimagesearch_tpu.utils.chunking import pad_rows, cdiv, round_up
from columbiaimagesearch_tpu.utils.codes import code_dtype_for
