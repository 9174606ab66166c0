"""ADE20K SceneParse150 metadata tables (data/ade_metadata.py — role of the
reference's register_ade20k_panoptic.py:8-165 catalog registration)."""
import numpy as np

from incomplete_multimodal_fusion_tpu.data import ade_metadata as m


def test_table_shape_and_known_entries():
    names = m.class_names()
    pal = m.palette()
    assert len(names) == 150 and pal.shape == (150, 3) and pal.dtype == np.uint8
    # spot-check against the public SceneParse150 table
    assert names[0] == "wall" and tuple(pal[0]) == (120, 120, 120)
    assert names[2] == "sky" and tuple(pal[2]) == (6, 230, 230)
    assert names[12] == "person" and tuple(pal[12]) == (150, 5, 61)
    assert names[20] == "car" and tuple(pal[20]) == (0, 102, 200)


def test_thing_stuff_partition():
    things, stuff = set(m.thing_ids()), set(m.stuff_ids())
    assert things | stuff == set(range(150)) and not (things & stuff)
    assert len(things) == 100  # ADE panoptic: 100 things / 50 stuff
    assert 12 in things and 0 in stuff  # person is a thing, wall is stuff


def test_metadata_dict_and_overlay_consumption():
    md = m.metadata()
    assert md["num_classes"] == 150
    assert len(md["stuff_classes"]) == 150
    # the palette drives colorize_labels / overlay_instances directly
    from incomplete_multimodal_fusion_tpu.infer_segmentation import colorize_labels

    lm = np.array([[0, 2], [12, 149]])
    rgb = colorize_labels(lm, colors=m.palette())
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 1]) == (6, 230, 230)  # sky color
