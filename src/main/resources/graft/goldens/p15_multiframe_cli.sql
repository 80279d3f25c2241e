SELECT * FROM (VALUES
('/root/reference/test/data/images/pbmc+PI_00000000.tiff', '2088261939', '0', '7abc43f10d94d37085feaf18b991aa36', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000001.tiff', '2116891090', '0', '9c2e1d2685ea66aef49217a722421a94', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000002.tiff', '2145520241', '0', '5eb6f7e73ebe7caa0eabf46e174bd8eb', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000003.tiff', '2174149392', '0', 'b82ef46675f810d46673665be87b5f97', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000004.tiff', '2202778543', '0', 'e5d3c431575960231058fe9e260999c3', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000005.tiff', '2231407694', '0', 'ce4372c26c0c7b599e4852336a01f0df', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000006.tiff', '2260036845', '0', '8da7cf671b0b6d88bb0190a84c0f3409', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000007.tiff', '2288665996', '0', '487639e8be3cb5ccc937393ac3b43f16', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000008.tiff', '2317295147', '0', 'ffe2179a5b0d9fd507f2bb5b32b8cb10', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000009.tiff', '2345924298', '0', '66f6f2b07f2b174522cc8ec9c8177a44', '104594567664116d41e4e43832ce94d9'),
('/root/reference/test/data/images/pbmc+PI_00000010.tiff', '2975765620', '0', 'e0995d2b3e20d43c7382935bc2261405', '104594567664116d41e4e43832ce94d9')
) AS t(meta_path, meta_idx, meta_id, row_digest, schema_digest)
ORDER BY meta_path, meta_idx, meta_id