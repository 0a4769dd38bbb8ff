from .image import read_image, to_uint8, write_png  # noqa: F401
from .loaders import (  # noqa: F401
    AbstractLoader, BytesLoader, FileLoader, HTTPLoader, make_loader,
)
from .readers import (  # noqa: F401
    BVPReader, RAWReader, load_volume, write_bvp,
)
from .zip_range import ZipRangeReader  # noqa: F401
