-- generated: QueryGenerator.statsWalkQuery(seed = 5247,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, embeddings v3 WHERE v2.label = v1.label AND v3.label = v2.label AND v1.label > 0 AND v2.label < 4 AND v3.label < 2
