from .mesh import make_mesh, pixel_sharding, replicated  # noqa: F401
from .shard import (  # noqa: F401
    shard_render_frame, sharded_scene, volume_sharding,
)
from . import dos_halo  # noqa: F401
from .resident import (  # noqa: F401
    assemble as resident_assemble, resident_render_frame,
    resident_reset,
)
