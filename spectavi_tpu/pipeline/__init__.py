"""``spectavi_tpu.pipeline`` — end-to-end reconstruction pipelines."""
from spectavi_tpu.pipeline.io import Timer, imread, read_ply, read_txt_matrix, rgb_to_gray, write_ply  # noqa: F401
from spectavi_tpu.pipeline.two_view import run_two_view  # noqa: F401
from spectavi_tpu.pipeline.sfm import run_sfm  # noqa: F401
