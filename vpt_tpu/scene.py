"""Scene graph: nodes, TRS transforms, perspective camera.

Host-side counterpart of the reference's scene layer
(``src/js/Node.js``, ``src/js/Transform.js:26-116``,
``src/js/PerspectiveCamera.js:15-17``).  The graph is a small Python
structure; all matrix math produces float32 JAX arrays so camera poses remain
differentiable when used inside jit.

The key product of this module is :func:`mvp_inverse`: the inverse of
``P @ V @ M @ center(-0.5)`` — the exact matrix the reference uploads as
``uMvpInverseMatrix`` (``src/js/renderers/MCMRenderer.js:164-175``) — which
renderers use to unproject pixel positions into texture-space rays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax.numpy as jnp

from . import math3d as m4


class Transform:
    """TRS transform with parent chain (cf. reference Transform.js).

    Mutating any local property fires registered change listeners — the hook
    the runtime uses to reset progressive accumulation on camera motion
    (reference ``RenderingContext.js:42-46``).
    """

    def __init__(self, node: "Optional[Node]" = None):
        self.node = node
        self._rotation = m4.quat_identity()
        self._translation = jnp.zeros(3, jnp.float32)
        self._scale = jnp.ones(3, jnp.float32)
        self._listeners: List[Callable[[], None]] = []

    # -- change events -----------------------------------------------------
    def add_change_listener(self, fn: Callable[[], None]):
        self._listeners.append(fn)

    def _changed(self):
        for fn in self._listeners:
            fn()

    # -- local properties --------------------------------------------------
    @property
    def local_rotation(self):
        return self._rotation

    @local_rotation.setter
    def local_rotation(self, q):
        self._rotation = jnp.asarray(q, jnp.float32)
        self._changed()

    @property
    def local_translation(self):
        return self._translation

    @local_translation.setter
    def local_translation(self, t):
        self._translation = jnp.asarray(t, jnp.float32)
        self._changed()

    @property
    def local_scale(self):
        return self._scale

    @local_scale.setter
    def local_scale(self, s):
        self._scale = jnp.asarray(s, jnp.float32)
        self._changed()

    @property
    def local_matrix(self):
        return m4.compose_trs(self._rotation, self._translation, self._scale)

    # -- global (walks parent chain like Transform.js:43-94) ---------------
    @property
    def global_matrix(self):
        if self.node is not None and self.node.parent is not None:
            return m4.matmul(self.node.parent.transform.global_matrix,
                             self.local_matrix)
        return self.local_matrix

    @property
    def inverse_global_matrix(self):
        return m4.invert(self.global_matrix)


class Component:
    """Base component with node backref (cf. reference Component.js)."""

    def __init__(self, node: "Node"):
        self.node = node


class Node:
    """Scene-graph node: children, traversal, component lookup
    (cf. reference Node.js:14-44)."""

    def __init__(self):
        self.parent: Optional[Node] = None
        self.children: List[Node] = []
        self.components: List[Component] = []
        self.transform = Transform(self)

    def add_child(self, child: "Node"):
        if child.parent is not None:
            child.parent.remove_child(child)
        child.parent = self
        self.children.append(child)

    def remove_child(self, child: "Node"):
        if child in self.children:
            self.children.remove(child)
            child.parent = None

    def traverse(self, before=None, after=None):
        if before:
            before(self)
        for child in self.children:
            child.traverse(before, after)
        if after:
            after(self)

    def get_component(self, cls):
        for comp in self.components:
            if isinstance(comp, cls):
                return comp
        return None


class PerspectiveCamera(Component):
    """fovy/aspect/near/far → projection matrix
    (cf. reference PerspectiveCamera.js:15-17; same defaults)."""

    def __init__(self, node: Node, fovy: float = 1.0, aspect: float = 1.0,
                 near: float = 0.1, far: float = 100.0):
        super().__init__(node)
        self.fovy = fovy
        self.aspect = aspect
        self.near = near
        self.far = far

    @property
    def projection_matrix(self):
        return m4.perspective(self.fovy, self.aspect, self.near, self.far)


def default_camera(translation=(0.0, 0.0, 2.0), fovy: float = 1.0) -> Node:
    """Camera node at [0,0,2] like the reference context
    (``RenderingContext.js:38-40``)."""
    node = Node()
    node.transform.local_translation = jnp.asarray(translation, jnp.float32)
    node.components.append(PerspectiveCamera(node, fovy=fovy))
    return node


import numpy as _np

CENTER_MATRIX = _np.array([
    [1, 0, 0, -0.5],
    [0, 1, 0, -0.5],
    [0, 0, 1, -0.5],
    [0, 0, 0, 1],
], dtype=_np.float32)


def model_view_matrix(camera: Node, volume_transform: Optional[Transform]):
    """``V @ M @ center(-0.5)`` — texture space to view space."""
    model = volume_transform.global_matrix if volume_transform is not None \
        else m4.identity()
    view = camera.transform.inverse_global_matrix
    return m4.matmul(m4.matmul(view, model), CENTER_MATRIX)


def mvp_inverse(camera: Node, volume_transform: Optional[Transform] = None):
    """Inverse MVP exactly as the reference builds it per frame
    (``MCMRenderer.js:164-175``): ``inv(P @ V @ M @ center)``."""
    proj = camera.get_component(PerspectiveCamera).projection_matrix
    return m4.invert(m4.matmul(proj,
                               model_view_matrix(camera, volume_transform)))


@dataclasses.dataclass
class CameraState:
    """Flat, jit-friendly camera description for functional APIs."""

    mvp_inverse: jnp.ndarray          # (4, 4) texture-space unprojection
    model_view: jnp.ndarray           # (4, 4) for DOS slice depth math
    projection: jnp.ndarray           # (4, 4)

    @staticmethod
    def from_nodes(camera: Node, volume_transform: Optional[Transform] = None):
        proj = camera.get_component(PerspectiveCamera).projection_matrix
        mv = model_view_matrix(camera, volume_transform)
        return CameraState(
            mvp_inverse=m4.invert(m4.matmul(proj, mv)),
            model_view=mv,
            projection=proj,
        )
