"""``spectavi_tpu.parallel`` — meshes, sharding, distributed execution."""
from spectavi_tpu.parallel.hosts import initialize, local_device_slice  # noqa: F401
from spectavi_tpu.parallel.mesh import BLOCKS, PAIRS, host_cpu_mesh, make_mesh  # noqa: F401
from spectavi_tpu.parallel.two_view import (  # noqa: F401
    make_two_view_step,
    sharded_l1_topk2,
    sharded_l2_topk2,
)
