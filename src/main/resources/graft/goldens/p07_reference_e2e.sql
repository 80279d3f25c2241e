SELECT * FROM (VALUES
('/root/reference/test/data/test.zarr', '15045', '0', '23af2d0fd6c71baa1a464c59c77a13c6', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '1963', '0', '5e9139688609f214a8d653f65b4c6eec', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '3462', '0', '8f61332d823793c8c7c6c47660bed872', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '5959', '0', 'bbb6f41e0991f93e81c51216ab3d78b4', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '6482', '0', 'dea30384a931cf1156656b0cde3ab88c', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '6801', '0', '03f919794430324569611f32e55a4db4', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '7297', '0', '81ab7bcfebf5e596450017c6efa6763f', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '7905', '0', 'c87ba016b288c1af0b74e1240bc62004', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '809', '0', '59d61df2b6840cd8aaae051ddcaadf47', 'cb85d0d16e579df76c66dbfbd384ccf2'),
('/root/reference/test/data/test.zarr', '9056', '0', 'defc79327b2255bcfe851fb5e8572ee7', 'cb85d0d16e579df76c66dbfbd384ccf2')
) AS t(meta_path, meta_idx, meta_id, row_digest, schema_digest)
ORDER BY meta_path, meta_idx, meta_id