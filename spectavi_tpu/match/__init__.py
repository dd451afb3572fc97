"""``spectavi_tpu.match`` — nearest-neighbour descriptor matching.

Public API mirrors the matching half of the reference's
``spectavi.feature`` (``/root/reference/spectavi/feature.py``):
``nn_bruteforce``, ``nn_bruteforcel1k2``, ``nn_cascading_hash``,
``nn_kmedians``, ``ann_hnswlib`` (here backed by sharded exact MXU
L2 as :func:`ann`).
"""

from spectavi_tpu.match.ann import ann, ann_hnswlib  # noqa: F401
from spectavi_tpu.match.bruteforce import (  # noqa: F401
    l1_topk2_xla,
    nn_bruteforce,
    nn_bruteforcel1k2,
    nn_l2k2,
)
from spectavi_tpu.match.cascade_hash import nn_cascading_hash  # noqa: F401
from spectavi_tpu.match.ivf import nn_ivf  # noqa: F401
from spectavi_tpu.match.kmedians import kmedians, nn_kmedians  # noqa: F401
