from .icp import (  # noqa: F401
    IcpParams,
    IcpResult,
    IcpStatic,
    align_clouds_global,
    calculate_velocity,
    make_icp_params,
    make_icp_static,
    radar_point_cov,
    run_register,
    separate_points_z,
)
