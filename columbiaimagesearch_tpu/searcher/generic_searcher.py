"""Generic searcher: component assembly + query entry points.

Same surface and knobs as the reference
(reference: cufacesearch/searcher/generic_searcher.py:9-425): sim_limit,
quota, near_dup(_th), reranking/rerank_nb, input_type, file_input,
skip_get_sim_info; entry points ``search_image{URL,B64,_path}_list`` that
detect/featurize each query then delegate to ``search_from_feats``.

Configuration is typed constructor arguments instead of the reference's
prefix-JSON ConfReader tree; ``from_conf`` adapts a flat conf dict.
"""


from columbiaimagesearch_tpu.searcher.output_mapping import DictOutput


class GenericSearcher:
    def __init__(self, detector_type="full", featurizer_type="sentibank",
                 input_type="image", sim_limit=100, quota=None,
                 near_dup=False, near_dup_th=0.8, top_feature=100,
                 reranking=False, rerank_nb=None, skip_get_sim_info=False,
                 file_input=False, dict_output_type="CamelCase",
                 detector=None, featurizer=None, indexer=None, storer=None,
                 verbose=0):
        self.detector_type = detector_type
        self.featurizer_type = featurizer_type
        self.input_type = input_type
        self.sim_limit = sim_limit
        self.quota = quota if quota is not None else 10 * sim_limit
        self.near_dup = near_dup
        self.near_dup_th = near_dup_th
        self.top_feature = top_feature
        self.reranking = reranking
        # The reference's top_feature knob's only live effect is as the
        # rerank-depth default (reference: generic_searcher.py:35,154:
        # rerank_nb = get_param('rerank_nb', default=self.top_feature)).
        self.rerank_nb = (rerank_nb if rerank_nb is not None
                          else (top_feature or 10 * sim_limit))
        self.skip_get_sim_info = skip_get_sim_info
        self.file_input = file_input
        self.verbose = verbose
        self.pp = type(self).__name__

        # Components: accept instances or build from types.
        if detector is not None:
            self.detector = detector
        else:
            from columbiaimagesearch_tpu.extraction.detector import get_detector

            self.detector = get_detector(detector_type)
        if featurizer is not None:
            self.featurizer = featurizer
        else:
            from columbiaimagesearch_tpu.extraction.extractor import get_featurizer

            self.featurizer = get_featurizer(featurizer_type)
        self.indexer = indexer
        self.storer = storer

        self.img_column = "info:s3_url"
        self.needed_output_columns = [self.img_column]
        self.do = DictOutput(dict_output_type)
        self.do.url_field = self.img_column

        self.init_searcher()

    @classmethod
    def from_conf(cls, conf: dict, **components):
        """Build from a flat conf dict (ConfReader-style keys)."""
        keys = ["detector_type", "featurizer_type", "input_type", "sim_limit",
                "quota", "near_dup", "near_dup_th", "top_feature",
                "reranking", "rerank_nb", "skip_get_sim_info", "file_input",
                "verbose"]
        kwargs = {k: conf[k] for k in keys if k in conf}
        kwargs.update(components)
        return cls(**kwargs)

    def build_extr_str(self):
        from columbiaimagesearch_tpu.extraction.extractor import build_extr_str

        return build_extr_str(self.featurizer_type, self.detector_type,
                              self.input_type)

    # ------------------------------------------------------ query frontends

    def search_imageURL_list(self, image_list, options_dict=None):
        from columbiaimagesearch_tpu.imgio.imgio import get_buffer_from_URL

        load_fn = (get_buffer_from_URL if self.detector is None
                   else self.detector.detect_from_url)
        return self._search_from_any_list(image_list, load_fn,
                                          options_dict or {}, push_img=True)

    def search_image_path_list(self, image_list, options_dict=None):
        from columbiaimagesearch_tpu.imgio.imgio import get_buffer_from_filepath

        load_fn = (get_buffer_from_filepath if self.detector is None
                   else self.detector.detect_from_filepath)
        return self._search_from_any_list(image_list, load_fn,
                                          options_dict or {}, push_img=True)

    def search_imageB64_list(self, imageB64_list, options_dict=None):
        from columbiaimagesearch_tpu.imgio.imgio import get_buffer_from_B64

        load_fn = (get_buffer_from_B64 if self.detector is None
                   else self.detector.detect_from_b64)
        return self._search_from_any_list(imageB64_list, load_fn,
                                          options_dict or {}, push_img=False)

    def _search_from_any_list(self, image_list, load_fn, options_dict,
                              push_img=False):
        """Detect/featurize each query then search
        (reference: generic_searcher.py:343-414)."""
        dets, feats = [], []
        for image in image_list:
            if self.detector is not None:
                infos, img, bboxes = load_fn(image)
                sha1, img_type, width, height = infos
                dets.append((sha1, bboxes, image if push_img else None,
                             img_type, width, height))
                face_feats = []
                if not options_dict.get("detect_only"):
                    if bboxes:
                        face_feats = list(self.featurizer.featurize_batch(
                            img, bboxes))
                feats.append(face_feats)
            else:
                from columbiaimagesearch_tpu.imgio.imgio import (
                    get_SHA1_from_buffer,
                    load_image_from_buffer,
                )

                buf = load_fn(image)
                sha1 = get_SHA1_from_buffer(buf)
                dets.append((sha1, image if push_img else None))
                # Use the same decode path as extraction (native imgpipe)
                # so query features match stored features bit-for-bit.
                # Fused serving path: when the featurizer can leave its
                # output on device and the backend accepts raw device
                # features, the feature never visits the host. Reranking
                # stays on the fused route when the backend holds a
                # device feature store (fused exact rerank); without one
                # it needs host features -> falls back.
                backend = getattr(self, "searcher", None)
                rerank_req = bool(options_dict.get("reranking",
                                                   self.reranking))
                use_device = (
                    hasattr(self.featurizer, "featurize_buffers_device")
                    and hasattr(backend, "search_device_feats")
                    and (not rerank_req
                         or getattr(backend, "has_rerank_feats", False)))
                if use_device:
                    buf.seek(0)
                    fts, status = self.featurizer.featurize_buffers_device(
                        [buf.read()])
                    if int(status[0]) == 0:
                        feats.append(fts[0])
                        continue
                # Device-path failure falls back here first: the buffers
                # path shares extraction's decode, so query features stay
                # bit-identical to stored ones (the PIL decode below does
                # not — last resort only).
                if hasattr(self.featurizer, "featurize_buffers"):
                    buf.seek(0)
                    fts, status = self.featurizer.featurize_buffers(
                        [buf.read()])
                    if status[0] == 0:
                        feats.append(fts[0])
                        continue
                feats.append(self.featurizer.featurize(
                    load_image_from_buffer(buf)))
        return self.search_from_feats(dets, feats, options_dict)

    # -------------------------------------------------- subclass interface

    def init_searcher(self):
        raise NotImplementedError("init_searcher")

    def train_index(self):
        raise NotImplementedError("train_index")

    def search_from_feats(self, dets, feats, options_dict=None):
        raise NotImplementedError("search_from_feats")
