-- generated: QueryGenerator.statsWalkQuery(seed = 5213,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, embeddings v2, embeddings v3 WHERE v1.vec_id = d1.doc_id AND v2.vec_id = d1.doc_id AND v3.label = v1.label AND d1.lang = 'zh' AND v1.label < 4 AND v3.label < 5 AND v2.label < 3 AND d1.source = 'src1'
