import json
import os

import numpy as np
import pytest

from uwcv_tpu.data.catalog import (
    DatasetCatalog,
    MetadataCatalog,
    register_superannotate,
)
from uwcv_tpu.data.classes import DEFAULT_CLASSES, ClassRegistry
from uwcv_tpu.data.coco import dataset_dicts_to_coco, load_coco_json
from uwcv_tpu.data.rasterize import annotations_to_arrays, polygons_to_mask
from uwcv_tpu.data.superannotate import (
    ellipse_to_polygon,
    get_superannotate_dicts,
)
from uwcv_tpu.data.synthetic import generate_dataset


# ---------- class registry ----------

def test_registry_defaults_match_reference():
    reg = ClassRegistry()
    assert reg.num_classes == 4
    assert reg.id_of("Pores of polyHIPEs") == 3
    assert reg.id_of("Scale bar 2") == 0  # substring containment
    with pytest.raises(ValueError, match="Category Name Not Found"):
        reg.id_of("unknown thing")
    assert reg.keywords == ["Scale", "WThick", "PThroat", "Pore"]


def test_registry_csv_roundtrip(tmp_path):
    p = tmp_path / "classes.csv"
    reg = ClassRegistry(names=["a", "b"], colors=[(1, 2, 3), (4, 5, 6)])
    reg.to_csv(str(p))
    reg2 = ClassRegistry.from_csv(str(p))
    assert reg2.names == ["a", "b"]
    assert reg2.colors == [(1, 2, 3), (4, 5, 6)]


def test_registry_csv_with_header(tmp_path):
    p = tmp_path / "classes.csv"
    p.write_text("className,red,green,blue\nfoo,10,20,30\n")
    reg = ClassRegistry.from_csv(str(p))
    assert reg.names == ["foo"] and reg.colors == [(10, 20, 30)]


# ---------- superannotate parsing ----------

def test_ellipse_polygon_geometry():
    pts = ellipse_to_polygon(50, 40, 10, 5, 0.0)
    assert pts.shape == (64, 2)
    np.testing.assert_allclose(pts[:, 0].max(), 60, atol=0.1)
    np.testing.assert_allclose(pts[:, 1].max(), 45, atol=0.1)
    # 90° rotation swaps the axes
    rot = ellipse_to_polygon(50, 40, 10, 5, 90.0)
    np.testing.assert_allclose(rot[:, 0].max(), 55, atol=0.1)
    np.testing.assert_allclose(rot[:, 1].max(), 50, atol=0.1)


def _write_sa_fixture(d, name="img.png", h=100, w=120):
    payload = {
        "metadata": {"name": name, "height": h, "width": w},
        "instances": [
            {"type": "polygon", "className": "Scale bar",
             "points": [10, 10, 30, 10, 30, 20, 10, 20]},
            {"type": "ellipse", "className": "Pores of polyHIPEs",
             "cx": 60, "cy": 50, "rx": 20, "ry": 10, "angle": 0},
            {"type": "polyline", "className": "Pores of polyHIPEs",
             "points": [0, 0, 5, 5]},
        ],
    }
    with open(os.path.join(d, name + ".json"), "w") as f:
        json.dump(payload, f)


def test_superannotate_parsing(tmp_path):
    _write_sa_fixture(str(tmp_path))
    dicts = get_superannotate_dicts(str(tmp_path))
    assert len(dicts) == 1
    rec = dicts[0]
    assert rec["height"] == 100 and rec["width"] == 120
    assert rec["file_name"].endswith("img.png")
    # polyline skipped → 2 annos
    assert len(rec["annotations"]) == 2
    poly_ann, ell_ann = rec["annotations"]
    assert poly_ann["category_id"] == 0
    # +0.5 shift applied
    np.testing.assert_allclose(poly_ann["bbox"], [10.5, 10.5, 30.5, 20.5])
    assert ell_ann["category_id"] == 3
    np.testing.assert_allclose(
        ell_ann["bbox"], [40.5, 40.5, 80.5, 60.5], atol=0.2)


def test_superannotate_unknown_class_raises(tmp_path):
    payload = {
        "metadata": {"name": "x.png", "height": 10, "width": 10},
        "instances": [{"type": "polygon", "className": "mystery",
                       "points": [0, 0, 5, 0, 5, 5]}],
    }
    (tmp_path / "x.json").write_text(json.dumps(payload))
    with pytest.raises(ValueError, match="Category Name Not Found"):
        get_superannotate_dicts(str(tmp_path))


# ---------- catalogs ----------

def test_catalog_lazy_and_duplicate():
    DatasetCatalog.remove("_t1")
    calls = []

    def thunk():
        calls.append(1)
        return [{"image_id": 0}]

    DatasetCatalog.register("_t1", thunk)
    assert calls == []  # lazy
    assert DatasetCatalog.get("_t1")[0]["image_id"] == 0
    DatasetCatalog.get("_t1")
    assert calls == [1]  # cached
    with pytest.raises(KeyError):
        DatasetCatalog.register("_t1", thunk)
    DatasetCatalog.remove("_t1")


def test_metadata_set_once():
    md = MetadataCatalog.get("_t2")
    md.set(thing_classes=["a"])
    assert md.thing_classes == ["a"]
    md.set(thing_classes=["a"])  # same value ok
    with pytest.raises(AttributeError):
        md.set(thing_classes=["b"])


# ---------- rasterization ----------

def test_polygon_rasterization_area():
    mask = polygons_to_mask([[10, 10, 40, 10, 40, 30, 10, 30]], 50, 60)
    assert mask.shape == (50, 60)
    area = mask.sum()
    assert 28 * 18 <= area <= 32 * 22  # ~30x20 rectangle


def test_annotations_to_arrays_padding():
    annos = [
        {"bbox": [0, 0, 10, 10], "category_id": 1,
         "segmentation": [[0, 0, 10, 0, 10, 10, 0, 10]]},
    ]
    arrs = annotations_to_arrays(annos, 20, 20, max_instances=5)
    assert arrs["boxes"].shape == (5, 4)
    assert arrs["valid"].tolist() == [True, False, False, False, False]
    assert arrs["masks"].shape == (5, 20, 20)
    assert arrs["masks"][0].sum() > 0 and arrs["masks"][1].sum() == 0


# ---------- synthetic dataset + end-to-end registration ----------

def test_synthetic_dataset_and_registration(tmp_path):
    paths = generate_dataset(str(tmp_path), num_train=2, num_test=1,
                             num_inference=1, image_size=(64, 64))
    assert os.path.exists(paths["classes_csv"])
    register_superannotate("_syn_train", paths["Train"],
                           classes_csv=paths["classes_csv"])
    dicts = DatasetCatalog.get("_syn_train")
    assert len(dicts) == 2
    assert all(os.path.exists(d["file_name"]) for d in dicts)
    cats = {a["category_id"] for d in dicts for a in d["annotations"]}
    assert cats == {0, 1, 2, 3}
    md = MetadataCatalog.get("_syn_train")
    assert md.thing_classes == list(DEFAULT_CLASSES)
    DatasetCatalog.remove("_syn_train")


# ---------- coco ----------

def test_coco_roundtrip(tmp_path):
    _write_sa_fixture(str(tmp_path))
    dicts = get_superannotate_dicts(str(tmp_path))
    coco = dataset_dicts_to_coco(dicts, DEFAULT_CLASSES)
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    loaded = load_coco_json(str(p), str(tmp_path))
    assert len(loaded) == 1
    assert len(loaded[0]["annotations"]) == 2
    np.testing.assert_allclose(
        loaded[0]["annotations"][0]["bbox"],
        dicts[0]["annotations"][0]["bbox"], atol=1e-6)


def test_load_16bit_tiff(tmp_path):
    """16-bit grayscale SEM TIFFs must scale 16->8 bit (/256, like the
    reference's cv2.imread), not clip to white via PIL convert("RGB")."""
    from PIL import Image

    from uwcv_tpu.data.loader import load_image_rgb

    grad = (np.arange(256, dtype=np.uint16)[None, :]
            * np.ones((8, 1), np.uint16)) * 257  # 0..65535 ramp
    path = str(tmp_path / "sem16.tif")
    Image.fromarray(grad, mode="I;16").save(path)

    img = load_image_rgb(path)
    assert img.shape == (8, 256, 3) and img.dtype == np.uint8
    # ramp preserved: leftmost ~0, rightmost ~255, midpoint ~128
    assert img[0, 0, 0] == 0 and img[0, -1, 0] == 255
    assert abs(int(img[0, 128, 0]) - 128) <= 1
    assert len(np.unique(img[0, :, 0])) > 200  # not clipped to white


def test_load_32bit_container_tiff(tmp_path):
    """PIL mode 'I' (32-bit container): scale by observed range, don't
    blindly assume 16-bit (values <=255 must pass through unchanged)."""
    from PIL import Image

    from uwcv_tpu.data.loader import load_image_rgb

    small = np.arange(256, dtype=np.int32)[None, :] * np.ones((4, 1), np.int32)
    p1 = str(tmp_path / "i32_small.tif")
    Image.fromarray(small, mode="I").save(p1)
    img = load_image_rgb(p1)
    assert img[0, 200, 0] == 200  # NOT 200>>8 == 0

    big = small * 257  # 16-bit-range data in an I container
    p2 = str(tmp_path / "i32_16bitrange.tif")
    Image.fromarray(big, mode="I").save(p2)
    img2 = load_image_rgb(p2)
    assert img2[0, -1, 0] == 255 and img2[0, 0, 0] == 0
