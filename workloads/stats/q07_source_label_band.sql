SELECT d.source, count(*) AS n
FROM documents d, embeddings v
WHERE d.doc_id = v.vec_id
  AND d.source IN ('src1', 'src2', 'src3', 'src4', 'src5')
  AND d.n_chars < 350
  AND v.label BETWEEN 2 AND 7
GROUP BY d.source ORDER BY d.source
