"""Protobuf import/export of LOPQ models.

Wire-compatible with the reference's format
(reference: lopq/lopq/model.py:748-820 ``export_proto``/``load_proto`` and the
com.flickr.vision.lopq schema), including the array ordering conventions:
``Rs``/``mus`` are chained across both coarse splits (2V entries, first split
then second), ``subs`` across both splits' fine splits (M entries).
"""

import numpy as np

from columbiaimagesearch_tpu.index.protos import lopq_model_pb2 as pb2


def _fill_matrix(m, a):
    a = np.asarray(a, dtype=np.float32)
    m.values.extend(a.reshape(-1, order="C").tolist())
    m.shape.extend(a.shape)
    return m


def _fill_vector(v, a):
    a = np.asarray(a, dtype=np.float32)
    v.values.extend(a.reshape(-1).tolist())
    return v


def export_proto(model, f):
    """Write model params in the reference's protobuf wire format."""
    p = pb2.LOPQModelParams()
    p.D = 2 * model.Cs[0].shape[1]
    p.V = model.V
    p.M = model.M
    p.num_subquantizers = model.subquantizer_clusters

    if model.Cs is not None:
        for C in model.Cs:
            _fill_matrix(p.Cs.add(), C)
    if model.Rs is not None:
        for split in model.Rs:
            for R in split:
                _fill_matrix(p.Rs.add(), R)
    if model.mus is not None:
        for split in model.mus:
            for mu in split:
                _fill_vector(p.mus.add(), mu)
    if model.subquantizers is not None:
        for split in model.subquantizers:
            for sub in split:
                _fill_matrix(p.subs.add(), sub)

    close = False
    if isinstance(f, str):
        f = open(f, "wb")
        close = True
    f.write(p.SerializeToString())
    if close:
        f.close()


def load_proto(filename):
    """Reconstitute an LOPQModel from the reference's protobuf format."""
    from columbiaimagesearch_tpu.index.model import LOPQModel

    p = pb2.LOPQModelParams()
    with open(filename, "rb") as f:
        p.ParseFromString(f.read())

    def halves(seq):
        n = len(seq) // 2
        return [seq[:n], seq[n:]]

    Cs = Rs = mus = subs = None
    if len(p.Cs):
        Cs = [np.array(C.values, dtype=np.float32).reshape(tuple(C.shape))
              for C in p.Cs]
    if len(p.Rs):
        mats = [np.array(R.values, dtype=np.float32).reshape(tuple(R.shape))
                for R in p.Rs]
        Rs = [np.stack(h) for h in halves(mats)]
    if len(p.mus):
        vecs = [np.array(mu.values, dtype=np.float32) for mu in p.mus]
        mus = [np.stack(h) for h in halves(vecs)]
    if len(p.subs):
        mats = [np.array(s.values, dtype=np.float32).reshape(tuple(s.shape))
                for s in p.subs]
        subs = halves(mats)

    return LOPQModel(parameters=(Cs, Rs, mus, subs))
