"""Detector facades: buffer/URL/B64/file plumbing around the conv detector.

Same surface as the reference's GenericDetector + detector utils
(reference: cufacesearch/detector/generic_detector.py:10-183,
detector/utils.py:100-124): every entry point resolves to an ndarray +
``detect_from_img`` and returns (infos,) image, detections.
"""

from columbiaimagesearch_tpu.imgio.imgio import (
    get_buffer_from_B64,
    get_buffer_from_filepath,
    get_buffer_from_URL,
    get_SHA1_img_info_from_buffer,
    load_image_from_buffer,
)
from columbiaimagesearch_tpu.models.face_detector import (
    DEFAULT_UPSAMPLING,
    ConvHOGFaceDetector,
)

DEFAULT_IMAGE_DL_TIMEOUT = 1


class GenericDetector:
    """Base class: buffer/URL/B64/file entry points."""

    def detect_from_filepath(self, img_file_path, up_sample=DEFAULT_UPSAMPLING,
                             with_infos=True):
        buf = get_buffer_from_filepath(img_file_path)
        if with_infos:
            return self.detect_from_buffer(buf, up_sample=up_sample)
        return self.detect_from_buffer_noinfos(buf, up_sample=up_sample)

    def detect_from_url(self, img_url, up_sample=DEFAULT_UPSAMPLING,
                        image_dl_timeout=DEFAULT_IMAGE_DL_TIMEOUT,
                        with_infos=True):
        buf = get_buffer_from_URL(img_url, image_dl_timeout=image_dl_timeout)
        if with_infos:
            return self.detect_from_buffer(buf, up_sample=up_sample)
        return self.detect_from_buffer_noinfos(buf, up_sample=up_sample)

    def detect_from_b64(self, img_base64str, up_sample=DEFAULT_UPSAMPLING,
                        with_infos=True):
        buf = get_buffer_from_B64(img_base64str)
        if with_infos:
            return self.detect_from_buffer(buf, up_sample=up_sample)
        return self.detect_from_buffer_noinfos(buf, up_sample=up_sample)

    def detect_from_buffer(self, img_buffer, up_sample=DEFAULT_UPSAMPLING):
        """:returns: (sha1, img_type, width, height), img, detections"""
        sha1, img_type, width, height = get_SHA1_img_info_from_buffer(img_buffer)
        img, detections = self.detect_from_buffer_noinfos(
            img_buffer, up_sample=up_sample)
        return (sha1, img_type, width, height), img, detections

    def detect_from_buffer_noinfos(self, img_buffer, up_sample=DEFAULT_UPSAMPLING):
        """:returns: img, detections"""
        img = load_image_from_buffer(img_buffer)
        return img, self.detect_from_img(img, up_sample=up_sample)

    def detect_from_img(self, img, up_sample=DEFAULT_UPSAMPLING):
        raise NotImplementedError()


class FaceDetector(GenericDetector):
    """The conv-HOG face detector behind the GenericDetector plumbing —
    fills the role of the reference's DLibFaceDetector."""

    def __init__(self, model: ConvHOGFaceDetector | None = None):
        self.model = model if model is not None else ConvHOGFaceDetector()

    def detect_from_img(self, img, up_sample=DEFAULT_UPSAMPLING):
        return self.model.detect_from_img(img, up_sample=up_sample)


def get_detector(detector_type):
    """Factory (reference: detector/utils.py:100-112): 'full' means no
    detector (whole-image featurization). 'dlib' is accepted as an alias of
    'face' for conf compatibility."""
    if detector_type in ("face", "dlib"):
        return FaceDetector()
    elif detector_type == "full":
        return None
    raise ValueError(f"[get_detector: error] unknown 'detector' {detector_type}.")


def get_bbox_str(bbox):
    """left_top_right_bottom_score string
    (reference: detector/utils.py:114-124)."""
    return "_".join(str(v) for v in
                    [bbox["left"], bbox["top"], bbox["right"], bbox["bottom"],
                     bbox["score"]])
