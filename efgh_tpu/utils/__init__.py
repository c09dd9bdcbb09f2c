from efgh_tpu.utils.viz import (
    eval_image_draw,
    image_draw,
    minmax_color_img,
    save_image,
    score_image,
)
