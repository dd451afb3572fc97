"""``spectavi_tpu.sfm`` — pose graph + bundle adjustment (beyond the reference)."""
from spectavi_tpu.sfm.ate import ate_rmse, camera_centers, umeyama  # noqa: F401
from spectavi_tpu.sfm.bundle_adjust import (  # noqa: F401
    ba_cost,
    ba_step,
    bundle_adjust,
    rodrigues,
    rotation_to_rvec,
)
from spectavi_tpu.sfm.pose_graph import (  # noqa: F401
    build_tracks,
    chain_poses,
    tracks_to_observations,
    triangulate_nview,
)
from spectavi_tpu.sfm.resection import incremental_poses, pnp_ransac  # noqa: F401
from spectavi_tpu.sfm.checkpoint import load_sfm_state, save_sfm_state  # noqa: F401
from spectavi_tpu.sfm.distributed import make_sharded_ba_step, pad_observations  # noqa: F401
