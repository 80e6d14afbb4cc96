"""Drive the House3D/SUNCG integration seam against a mock environment.

Exercises the full real-dataset path with no external deps: a fake
``House3D.objrender`` module + a fake ``House3DUtils`` (the protocol the
EmbodiedQA fork exposes, scripts/trajectory_gen.py:82-89,216-273) feed
``load_suncg_house -> SceneGraph -> House3DRenderer -> TrajectoryObserver ->
QuestionEngine``, using the in-tree colormap_coarse.csv / object_id_to_colors
assets.
"""

import random
import sys
import types

import numpy as np
import pytest

from videonavqa_tpu.datagen.assets import (
    COLORMAP_COARSE_CSV, OBJECT_ID_TO_COLORS_NPY,
)
from videonavqa_tpu.datagen.engine import QuestionEngine
from videonavqa_tpu.datagen.house3d_backend import (
    House3DRenderer, load_obj_colors, load_suncg_house,
)
from videonavqa_tpu.datagen.scene import SceneGraph
from videonavqa_tpu.datagen.trajectory import TrajectoryObserver
from videonavqa_tpu.datagen.vision import DEPTH_SCALE, load_semantic_colormap

HOUSE_ID = "mockhouse"

# Handcrafted two-room house in House3DUtils shapes: rooms carry node ids,
# objects are keyed '0_<node>' (scripts/trajectory_gen.py:276-280).
_BED_BBOX = {"min": [2.0, 0.0, 2.0], "max": [4.0, 1.0, 4.0]}
_DOOR_BBOX = {"min": [5.9, 0.0, 2.5], "max": [6.1, 2.2, 3.5]}
_SINK_BBOX = {"min": [8.0, 0.6, 1.0], "max": [9.0, 1.1, 2.0]}
_ROOMS = [
    {"type": ["bedroom"], "bbox": {"min": [0.0, 0.0, 0.0], "max": [6.0, 3.0, 6.0]},
     "nodes": [1, 2]},
    {"type": ["kitchen"], "bbox": {"min": [6.0, 0.0, 0.0], "max": [12.0, 3.0, 6.0]},
     "nodes": [3]},
]
_OBJECTS = {
    "0_1": {"coarse_class": "bed", "bbox": _BED_BBOX, "id": "0_0001"},
    "0_2": {"coarse_class": "door", "bbox": _DOOR_BBOX, "id": "0_0002"},
    "0_3": {"coarse_class": "sink", "bbox": _SINK_BBOX, "id": "0_0003"},
}
_OBJ_COLORS = {HOUSE_ID + ".0_0001": "blue", HOUSE_ID + ".0_0003": "white"}


class _FakeUtils:
    """House3DUtils protocol surface: .rooms / .objects."""

    rooms = _ROOMS
    objects = _OBJECTS


class _Vec:
    x = y = z = 0.0


class _Cam:
    def __init__(self):
        self.pos = _Vec()
        self.yaw = 0.0

    def updateDirection(self):  # noqa: N802 — House3D camelCase API
        pass


class _FakeEnv:
    """Mimics House3D.Environment: renders whichever mock object the agent's
    room contains, with depth encoding the true bbox-centre distance."""

    def __init__(self, colormap):
        self.cam = _Cam()
        self._mode = None
        self._colormap = colormap  # {(r,g,b): name}
        self._by_name = {v: k for k, v in colormap.items()}

    def set_render_mode(self, mode):
        self._mode = mode

    def _visible(self):
        x = self.cam.pos.x
        if x < 6.0:
            return [("bed", _BED_BBOX), ("door", _DOOR_BBOX)]
        return [("sink", _SINK_BBOX)]

    def render(self):
        H, W = 160, 208
        sem = np.zeros((H, W, 3), dtype=np.uint8)
        depth = np.zeros((H, W, 2), dtype=np.uint8)
        pos = np.array([self.cam.pos.x, self.cam.pos.y, self.cam.pos.z])
        for i, (name, bbox) in enumerate(self._visible()):
            centre = (np.array(bbox["min"]) + np.array(bbox["max"])) / 2.0
            dist = float(np.linalg.norm(pos - centre))
            cols = slice(i * 40, i * 40 + 40)
            sem[:, cols] = self._by_name[name]
            depth[:, cols, 0] = int(round(dist / DEPTH_SCALE))
        mode = str(self._mode)
        if "SEMANTIC" in mode:
            return sem
        if "DEPTH" in mode:
            return depth
        return np.full((H, W, 3), 127, dtype=np.uint8)  # RGB


@pytest.fixture()
def fake_house3d(monkeypatch):
    pkg = types.ModuleType("House3D")
    objrender = types.ModuleType("House3D.objrender")

    class RenderMode:
        RGB = "H3D_RGB"
        SEMANTIC = "H3D_SEMANTIC"
        DEPTH = "H3D_DEPTH"

    objrender.RenderMode = RenderMode
    pkg.objrender = objrender
    monkeypatch.setitem(sys.modules, "House3D", pkg)
    monkeypatch.setitem(sys.modules, "House3D.objrender", objrender)


def test_shipped_assets_load():
    colormap = load_semantic_colormap(COLORMAP_COARSE_CSV)
    assert colormap[(254, 255, 230)] == "bed"
    assert len(colormap) == 94
    obj_colors = load_obj_colors(OBJECT_ID_TO_COLORS_NPY)
    assert len(obj_colors) > 2000
    assert all(isinstance(v, list) for v in list(obj_colors.values())[:10])


def test_renderer_requires_house3d():
    with pytest.raises(ImportError, match="House3D fork not installed"):
        House3DRenderer(object())


def test_house3d_seam_end_to_end(fake_house3d, tmp_path):
    rooms = load_suncg_house(_FakeUtils(), HOUSE_ID, _OBJ_COLORS)
    assert len(rooms) == 2
    bed = next(o for o in rooms[0].objects if o.coarse_class == "bed")
    assert bed.node == ".0_0001" and bed.color == "blue"

    scene = SceneGraph(rooms)
    colormap = load_semantic_colormap(COLORMAP_COARSE_CSV)
    renderer = House3DRenderer(_FakeEnv(colormap))
    observer = TrajectoryObserver(scene, renderer, rgb_to_obj=colormap,
                                  compute_seen_doors=True)

    # walk bedroom -> kitchen (poses are (x, y, z, yaw))
    coors = [(3.0, 1.2, 3.0, 0.0), (5.0, 1.2, 3.0, 90.0), (9.0, 1.2, 3.0, 0.0)]
    per_frame = observer.observe(coors, return_objects_in_frames=True)
    assert "bed" in per_frame[0] and "sink" in per_frame[2]

    seen = {o["obj_type"]: o for o in scene.get_all_objects()}
    assert seen["bed"]["seen"] and seen["bed"]["color"] == "blue"
    assert "sink" in seen
    visited = {r["room_type"] for r in scene.get_all_rooms()}
    assert visited == {"bedroom", "kitchen"}
    assert observer.doors  # door matched house-wide with adjacent rooms
    door = next(iter(observer.doors.values()))
    assert len(door["adjacent_rooms"]) >= 1

    # question generation over the observed SUNCG-style scene
    engine = QuestionEngine(str(tmp_path), random.Random(0))
    example = engine.generate_for_trajectory(0, scene)
    assert example is not None
    assert example["q_text"] and example["q_ans"] is not None
    assert 0 <= example["q_id"] <= 28
    engine.dump_dataset(HOUSE_ID)
    assert (tmp_path / (HOUSE_ID + ".json")).exists()


def test_house3d_video_render(fake_house3d):
    rooms = load_suncg_house(_FakeUtils(), HOUSE_ID, _OBJ_COLORS)
    colormap = load_semantic_colormap(COLORMAP_COARSE_CSV)
    renderer = House3DRenderer(_FakeEnv(colormap))
    observer = TrajectoryObserver(SceneGraph(rooms), renderer, rgb_to_obj=colormap)
    frames = observer.render_video([(3.0, 1.2, 3.0, 0.0), (9.0, 1.2, 3.0, 0.0)])
    assert frames.shape == (2, 160, 208, 3) and frames.dtype == np.uint8
