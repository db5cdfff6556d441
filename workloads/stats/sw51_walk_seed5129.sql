-- generated: QueryGenerator.statsWalkQuery(seed = 5129,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, embeddings v2, documents d2, embeddings v3 WHERE v1.vec_id = d1.doc_id AND v2.label = v1.label AND d2.lang = d1.lang AND v3.label = v2.label AND v2.label < 4 AND d1.source = 'src12'
