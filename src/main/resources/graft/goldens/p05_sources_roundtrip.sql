SELECT * FROM (VALUES
('/tmp/graft-src-fixtures/events.zarr', '1000', '0', '3d6a1cf6153c84023accd48e03e7f296', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/events.zarr', '1001', '0', '8af5e55de524e4de57c3a23e494d7811', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/events.zarr', '1002', '0', 'bc44e1eb8d4c91c3f17ff8abd34e9b6f', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/events.zarr', '1003', '0', '045e86d445f53796028d246280b22e31', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/plate.czi', '0', '0', 'b4edc7448fcc0a33f2cf67a6c5025882', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/plate.czi', '1', '1', '7ac442aeb4e76eda9fe811507c635ed0', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/tiff/img_a_ch0.tif', '97', '0', '811c1efb377500299bbee4f5f83bc70b', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/tiff/img_b_ch0.tif', '98', '0', '566af4ea2ba5744fb98c3873f63f82b4', '11d0bd0021921e2d851009c84b565a13'),
('/tmp/graft-src-fixtures/tiff/img_c_ch0.tif', '99', '0', '64b8341d4e881a4ce468c8c486045508', '11d0bd0021921e2d851009c84b565a13')
) AS t(meta_path, meta_idx, meta_id, row_digest, schema_digest)
ORDER BY meta_path, meta_idx, meta_id