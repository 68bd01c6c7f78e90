from .builder import (  # noqa: F401
    BuiltMap,
    build_voxel_map,
    find_ground_height as find_ground_height_host,
    voxel_downsample_host,
)
from .pcd import (  # noqa: F401
    parse_origin_from_filename,
    read_pcd,
    read_pcd_points,
    write_pcd,
)
from .tiles import (  # noqa: F401
    HostTileMap,
    TileMap,
    TileQueryBudget,
    build_tile_map,
    load_tile_map,
)
from .grid import (  # noqa: F401
    MapGrid,
    OFFSETS_7,
    OFFSETS_27,
    find_ground_height,
    lookup,
    point_to_voxel,
    query_all_voxel_cov,
    query_nearest_point,
    query_nearest_point_cov,
    query_nearest_voxel_cov,
    to_device,
    voxel_downsample,
)
