SELECT * FROM (VALUES
('synthetic://conftest/0', '0', '0', '2438b84f38e5634c98731ba6c824383b', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/1', '1', '0', '8e0d1415a49fbf319f973c1990849a47', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/2', '2', '0', '2fed547d39d774754393c4db5c0d5b8b', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/3', '3', '0', '49944fda7e5db57c2fb802a618e952f1', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/4', '4', '0', '8dcc3fc0f9e3fa754e7ddeca64fe3f58', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/5', '5', '0', 'b2ff38045004cad36225793daa7f87fa', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/6', '6', '0', 'e4ef2e3f331bf275a897e4349cdcf73d', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/7', '7', '0', 'f379599fd11166824164ad737a8c9640', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/8', '8', '0', '1ea44bbfd80419fa6f4f577e8642ebdd', '70cc8a2666508be6e5e2d4b22b67c1e6'),
('synthetic://conftest/9', '9', '0', 'aad9d3981734c01ed75b98c3696bf641', '70cc8a2666508be6e5e2d4b22b67c1e6')
) AS t(meta_path, meta_idx, meta_id, row_digest, schema_digest)
ORDER BY meta_path, meta_idx, meta_id