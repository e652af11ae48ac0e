"""Headless tests for the GL viewer math (bts_tpu/apps/live3d_gl.py).

The GL shell itself needs Qt/PyOpenGL (absent in this image); everything it
computes — MVP matrices, trackball state, VBO vertex data — is pure numpy
and verified here. Reference semantics: pytorch/bts_live_3d.py:300-484.
"""

import numpy as np

from bts_tpu.apps.live3d_gl import (
    EDGE_FAR,
    SCENE_SHIFT,
    Trackball,
    cloud_vertex_data,
    look_at,
    perspective,
    rotate,
)


def _project(mvp, p):
    v = mvp @ np.array([*p, 1.0], np.float32)
    return v[:3] / v[3]


def test_perspective_matrix():
    m = perspective(45.0, 640 / 480, 0.01, 100.0)
    # Points on the near/far planes map to NDC z = -1 / +1.
    assert np.isclose(_project(m, (0, 0, -0.01))[2], -1.0, atol=1e-5)
    assert np.isclose(_project(m, (0, 0, -100.0))[2], 1.0, atol=1e-4)
    # A point on the top edge of the frustum at z=-1 hits NDC y=1.
    f = 1.0 / np.tan(np.deg2rad(45.0) / 2.0)
    assert np.isclose(_project(m, (0, 1.0 / f, -1.0))[1], 1.0, atol=1e-5)


def test_look_at():
    # Camera at origin looking down -z with +y up = identity view.
    m = look_at((0, 0, 0), (0, 0, -1), (0, 1, 0))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-7)
    # Looking at a point 2 units ahead from z=+2: that point lands at
    # view-space z = -2 (in front of the camera).
    m = look_at((0, 0, 2), (0, 0, 0), (0, 1, 0))
    np.testing.assert_allclose(
        (m @ np.array([0, 0, 0, 1.0]))[:3], [0, 0, -2], atol=1e-7
    )


def test_rotate_axis_angle():
    m = rotate(np.eye(4, dtype=np.float32), np.pi / 2, (0, 0, 1))
    np.testing.assert_allclose(
        (m @ np.array([1, 0, 0, 1.0]))[:3], [0, 1, 0], atol=1e-6
    )
    # Post-multiplication: rotate(M, a, ax) applies the rotation in M's
    # local frame (glm.rotate semantics).
    base = rotate(np.eye(4, dtype=np.float32), np.pi / 2, (0, 1, 0))
    m2 = rotate(base, np.pi / 2, (0, 0, 1))
    np.testing.assert_allclose(m2[:3, :3], base[:3, :3] @ m2_local(), atol=1e-6)


def m2_local():
    c, s = 0.0, 1.0
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_trackball_reference_semantics():
    tb = Trackball()
    # Reference initial pose (pytorch/bts_live_3d.py:303-306).
    assert (tb.x_rot, tb.y_rot, tb.z_rot, tb.zoom_level) == (5040, 40, 0, 9)

    # Left drag: dy adds to xRot, -dx adds to yRot.
    tb.drag(dx_px=10, dy_px=4, button="left")
    assert (tb.x_rot, tb.y_rot, tb.z_rot) == (5044, 30, 0)
    # Right drag: dy adds to xRot, -dx adds to zRot.
    tb.drag(dx_px=-6, dy_px=1, button="right")
    assert (tb.x_rot, tb.y_rot, tb.z_rot) == (5045, 30, 6)
    # Wheel: 120 eighth-degrees = one 15-degree step = +1 zoom level.
    tb.wheel(120)
    assert np.isclose(tb.zoom_level, 10.0)

    mvp = tb.mvp(640, 480)
    assert mvp.shape == (4, 4) and mvp.dtype == np.float32
    assert np.all(np.isfinite(mvp))
    # Zooming out moves the eye back -> projected points shrink toward
    # the center.
    p = np.array([0.05, 0.0, -0.5])
    x_near = abs(_project(mvp, p)[0])
    tb.zoom_level = 20.0
    x_far = abs(_project(tb.mvp(640, 480), p)[0])
    assert x_far < x_near


def test_cloud_vertex_data():
    h, w = 6, 8
    depth = np.full((h, w), 2.0, np.float32)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = 255
    pos, col = cloud_vertex_data(depth, rgb, focal=100.0)
    # Fixed-length buffers: one vertex per pixel, edges hidden not dropped.
    assert pos.shape == (h * w, 3) and col.shape == (h * w, 3)
    np.testing.assert_allclose(col[:, 0], 1.0)
    np.testing.assert_allclose(col[:, 1:], 0.0)
    # Flat depth -> no edges; z = depth + scene shift everywhere.
    np.testing.assert_allclose(pos[:, 2], 2.0 + SCENE_SHIFT[2], atol=1e-6)
    # Ray math: pixel (0,0) -> ((0-w/2)/f*z, (0-h/2)/f*z, z) + shift.
    np.testing.assert_allclose(
        pos[0], [(0 - w / 2) / 100.0 * 2.0 + SCENE_SHIFT[0],
                 (0 - h / 2) / 100.0 * 2.0 + SCENE_SHIFT[1],
                 2.0 + SCENE_SHIFT[2]],
        atol=1e-6,
    )

    # A depth step produces hidden (z≈1e6) vertices at the discontinuity,
    # and the buffer length does not change.
    depth2 = depth.copy()
    depth2[:, 4:] = 9.0
    pos2, _ = cloud_vertex_data(depth2, rgb, focal=100.0)
    assert pos2.shape == (h * w, 3)
    assert (pos2[:, 2] > EDGE_FAR / 2).any()
    # Non-edge pixels keep their true depth.
    assert np.isclose(pos2[0, 2], 2.0 + SCENE_SHIFT[2], atol=1e-5)


def test_gl_shell_import_gated():
    """Without Qt/PyOpenGL installed, the GL entry points raise ImportError
    (and main() falls back); the math API stays importable."""
    import pytest

    from bts_tpu.apps import live3d_gl

    try:
        live3d_gl._import_gui()
        have_gui = True
    except ImportError:
        have_gui = False
    if not have_gui:
        with pytest.raises(ImportError):
            live3d_gl.make_widget_class()


# ---------------- stub-injected GL/Qt shell execution ----------------
#
# Fake Qt + PyOpenGL + cv2 modules exercise the actual widget wiring —
# VBO update path, event->trackball plumbing, the run_gl webcam loop
# (reference: pytorch/bts_live_3d.py:383-484) — without a GUI stack.

import sys
import types
from unittest import mock


class _Recorder:
    """Attribute sink: every attribute is a callable that records calls
    and returns an int (GL handles/locations)."""

    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)

        def fn(*a, **k):
            self.calls.append((name, a, k))
            return 7

        return fn

    def named(self, name):
        return [c for c in self.calls if c[0] == name]


class _FakeVBO:
    instances = []

    def __init__(self, data=None, usage=None, target=None):
        self.data = data
        self.set_calls = []
        self.bound = 0
        _FakeVBO.instances.append(self)

    def set_array(self, arr):
        self.set_calls.append(np.asarray(arr))

    def bind(self):
        self.bound += 1


def _fake_gui_modules():
    """Build sys.modules entries for PySide6 + OpenGL (+ cv2)."""
    gl_rec = _Recorder()

    qtcore = types.ModuleType("PySide6.QtCore")

    class _Qt:
        LeftButton, RightButton = 1, 2

    class _Signal:
        def __init__(self):
            self.slots = []

        def connect(self, fn):
            self.slots.append(fn)

    class _QTimer:
        instances = []

        def __init__(self):
            self.timeout = _Signal()
            self.started = None
            _QTimer.instances.append(self)

        def start(self, ms):
            self.started = ms

    qtcore.Qt, qtcore.QTimer = _Qt, _QTimer

    qtwidgets = types.ModuleType("PySide6.QtWidgets")

    class _QApplication:
        _instance = None

        def __init__(self, argv=None):
            _QApplication._instance = self

        @staticmethod
        def instance():
            return _QApplication._instance

        def exec_(self):
            # Drive every started timer a few ticks, like an event loop.
            for t in _QTimer.instances:
                for _ in range(3):
                    for slot in t.timeout.slots:
                        slot()
            return 0

    qtwidgets.QApplication = _QApplication

    qtglw = types.ModuleType("PySide6.QtOpenGLWidgets")

    class _QOpenGLWidget:
        def __init__(self, parent=None):
            self.update_count = 0
            self._shown = False

        def update(self):
            self.update_count += 1

        def width(self):
            return 640

        def height(self):
            return 480

        def setWindowTitle(self, t):
            self.title = t

        def resize(self, w, h):
            self.size = (w, h)

        def show(self):
            self._shown = True
            # Real Qt drives GL init + first paint on show.
            self.initializeGL()
            self.paintGL()

    qtglw.QOpenGLWidget = _QOpenGLWidget

    pyside6 = types.ModuleType("PySide6")
    pyside6.QtCore, pyside6.QtWidgets = qtcore, qtwidgets

    opengl = types.ModuleType("OpenGL")
    gl_mod = types.ModuleType("OpenGL.GL")
    for bit, const in enumerate((
        "GL_DEPTH_TEST", "GL_VERTEX_SHADER", "GL_FRAGMENT_SHADER",
        "GL_DYNAMIC_DRAW", "GL_ARRAY_BUFFER", "GL_COLOR_BUFFER_BIT",
        "GL_DEPTH_BUFFER_BIT", "GL_FLOAT", "GL_FALSE", "GL_POINTS",
    )):
        setattr(gl_mod, const, 1 << bit)  # int flags: glClear or's them
    for fn in (
        "glEnable", "glGetUniformLocation", "glClear", "glUniformMatrix4fv",
        "glPointSize", "glEnableVertexAttribArray", "glVertexAttribPointer",
        "glDrawArrays",
    ):
        setattr(gl_mod, fn, getattr(gl_rec, fn))
    arrays_mod = types.ModuleType("OpenGL.arrays")
    vbo_mod = types.ModuleType("OpenGL.arrays.vbo")
    vbo_mod.VBO = _FakeVBO
    arrays_mod.vbo = vbo_mod
    shaders_mod = types.ModuleType("OpenGL.GL.shaders")
    shaders_mod.compileShader = getattr(gl_rec, "compileShader")
    shaders_mod.compileProgram = getattr(gl_rec, "compileProgram")
    shaders_mod.glUseProgram = getattr(gl_rec, "glUseProgram")
    opengl.GL = gl_mod
    opengl.arrays = arrays_mod
    gl_mod.shaders = shaders_mod

    cv2_mod = types.ModuleType("cv2")
    cv2_mod.COLOR_BGR2RGB = 4

    class _Cap:
        def __init__(self, idx):
            self.reads = 0
            self.released = False

        def read(self):
            self.reads += 1
            return True, np.zeros((480, 640, 3), np.uint8)

        def release(self):
            self.released = True

    cv2_mod.VideoCapture = _Cap
    cv2_mod.cvtColor = lambda img, code: img[..., ::-1]

    return {
        "PySide6": pyside6,
        "PySide6.QtCore": qtcore,
        "PySide6.QtWidgets": qtwidgets,
        "PySide6.QtOpenGLWidgets": qtglw,
        "OpenGL": opengl,
        "OpenGL.GL": gl_mod,
        "OpenGL.arrays": arrays_mod,
        "OpenGL.arrays.vbo": vbo_mod,
        "OpenGL.GL.shaders": shaders_mod,
        "cv2": cv2_mod,
    }, gl_rec


def test_widget_wiring_headless():
    """make_widget_class against stub Qt/GL: VBO data path, paintGL GL
    call sequence, and mouse/wheel -> trackball plumbing all execute."""
    from bts_tpu.apps import live3d_gl

    mods, gl_rec = _fake_gui_modules()
    with mock.patch.dict(sys.modules, mods):
        widget_cls = live3d_gl.make_widget_class()
        w = widget_cls()
        w.initializeGL()
        assert len(_FakeVBO.instances[-2:]) == 2  # pos + col VBOs

        rgb = np.full((4, 6, 3), 128, np.uint8)
        depth = np.full((4, 6), 2.0, np.float32)
        w.update_rgbd(rgb, depth)
        assert w.update_count == 1
        pos, col = cloud_vertex_data(depth, rgb)
        np.testing.assert_allclose(w.pos, pos)
        np.testing.assert_allclose(w.col, col)

        w.paintGL()
        # The current vertex data rode the VBO update path.
        pos_vbo, col_vbo = _FakeVBO.instances[-2], _FakeVBO.instances[-1]
        assert pos_vbo.set_calls and col_vbo.set_calls
        np.testing.assert_allclose(pos_vbo.set_calls[-1], pos)
        assert pos_vbo.bound == 1 and col_vbo.bound == 1
        draw = gl_rec.named("glDrawArrays")
        assert draw and draw[-1][1][2] == pos.shape[0]
        # MVP uniform carries the trackball matrix (transpose=True for GL).
        mvp_call = gl_rec.named("glUniformMatrix4fv")[-1]
        np.testing.assert_allclose(
            mvp_call[1][3], w.trackball.mvp(640, 480), atol=1e-6
        )

        # Event -> trackball plumbing.
        class _Pt:
            def __init__(self, x, y):
                self._x, self._y = x, y

            def x(self):
                return self._x

            def y(self):
                return self._y

        class _Ev:
            def __init__(self, x, y, buttons=1):
                self._x, self._y, self._b = x, y, buttons

            def pos(self):
                return _Pt(self._x, self._y)

            def x(self):
                return self._x

            def y(self):
                return self._y

            def buttons(self):
                return self._b

        rot_before = w.trackball.yaw if hasattr(w.trackball, "yaw") else None
        mvp_before = w.trackball.mvp(640, 480).copy()
        w.mousePressEvent(_Ev(10, 10))
        w.mouseMoveEvent(_Ev(30, 10, buttons=1))  # left drag = orbit
        assert not np.allclose(w.trackball.mvp(640, 480), mvp_before)

        class _Wheel:
            def angleDelta(self):
                return types.SimpleNamespace(y=lambda: 120)

            def accept(self):
                pass

        mvp_before = w.trackball.mvp(640, 480).copy()
        w.wheelEvent(_Wheel())
        assert not np.allclose(w.trackball.mvp(640, 480), mvp_before)


def test_run_gl_headless():
    """run_gl's full shell — QApplication, timer ticks, webcam frames ->
    depth_fn -> widget.update_rgbd — executes against the stubs
    (reference main loop: pytorch/bts_live_3d.py:196-297)."""
    from bts_tpu.apps import live3d_gl
    from bts_tpu.config import Config

    mods, _ = _fake_gui_modules()
    frames = []

    def depth_fn(rgb):
        frames.append(rgb.shape)
        return np.full(rgb.shape[:2], 3.0, np.float32)

    with mock.patch.dict(sys.modules, mods):
        rc = live3d_gl.run_gl(Config(), depth_fn=depth_fn)
    assert rc == 0
    assert len(frames) == 3  # one per timer tick from the fake event loop


def test_live3d_main_cv2_fallback(monkeypatch):
    """apps/live3d.py::main's cv2 colormap loop (the no-Qt fallback,
    mirroring the reference's webcam loop pytorch/bts_live_3d.py:276-319)
    executes against a stub cv2: one frame -> depth -> colormap -> 'q'."""
    from bts_tpu.apps import live3d

    shown = []

    class _Cap:
        def __init__(self, idx):
            self.released = False

        def read(self):
            return True, np.zeros((480, 640, 3), np.uint8)

        def release(self):
            self.released = True

    cv2_mod = types.ModuleType("cv2")
    cv2_mod.COLOR_BGR2RGB = 4
    cv2_mod.COLORMAP_MAGMA = 13
    cv2_mod.VideoCapture = _Cap
    cv2_mod.cvtColor = lambda img, code: img[..., ::-1]
    cv2_mod.applyColorMap = lambda vis, cmap: np.stack([vis] * 3, -1)
    cv2_mod.imshow = lambda name, img: shown.append(img.shape)
    cv2_mod.waitKey = lambda ms: ord("q")

    monkeypatch.setattr(
        live3d, "make_depth_fn",
        lambda cfg: (lambda rgb: np.full(rgb.shape[:2], 2.5, np.float32)),
    )
    # No PySide6/PySide2 in sys.modules -> run_gl's _import_gui raises
    # ImportError and main falls back to the cv2 loop.
    with mock.patch.dict(sys.modules, {"cv2": cv2_mod}):
        from bts_tpu.config import Config

        rc = live3d.main(Config())
    assert rc == 0
    assert shown == [(480, 640, 3)]
