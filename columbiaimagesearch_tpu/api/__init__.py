from columbiaimagesearch_tpu.api.app import SearchAPI, make_server
