"""Host-side utilities: file IO, naming, timing, visualization."""

from dynamo_depth_tpu.utils.io import (  # noqa: F401
    get_filenames,
    get_model_ckpt_name,
    is_edge,
    join_dir,
    readlines,
    sec_to_hm_str,
    write_to_file,
)
