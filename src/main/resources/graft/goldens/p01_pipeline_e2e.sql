SELECT * FROM (VALUES
('synthetic://conftest/0', '0', '0', '0c406e48f02d1f2b2b6abab856c11fbb', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/1', '1', '0', '6e283a11d7b355aaec899b5e2e477512', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/2', '2', '0', '468928acf4a2a0767b94529af9909106', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/3', '3', '0', 'dc12abace2533df5be7c81a72078551e', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/4', '4', '0', '0b5792e0b05a58b7ceffc52014b265a5', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/5', '5', '0', '3c972d3d61be2f7b958588e1c010043e', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/6', '6', '0', '4db70466d93a7d150a2ef0fabd80f883', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/7', '7', '0', 'b0bc31a46ecdc04127ec2f47184e2b82', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/8', '8', '0', 'a6823912d5aa62191838a30387034b83', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/9', '9', '0', '14c615450b53080af5c11615c21d1e0d', '70cc8a2666508be6e5e2d4b22b67c1e6')
) AS t(meta_path, meta_idx, meta_id, row_digest, schema_digest)
ORDER BY meta_path, meta_idx, meta_id