package graft

import graft.sql.GraftSql
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The reference's real-query corpus (testes-sqls.txt:1-232) run against
  * an F8-style fixture (FIXTURES.md: Brazilian PIS/COFINS schema —
  * double-quoted identifiers with spaces, accents, parens, slashes).
  * Every corpus query must parse and run through the dialect shim.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def fixture(): DataFrame = {
    val df = Seq(
      ("111", 2024, 4, "dezembro", "PAC 12345678 2019.01", "Saldo credor", 55, 1.65, 11700.0, 10.0, 20.0, 30.0, 60.0, 100.0, 40.0, "PERD1", "entrada"),
      ("222", 2024, 4, "Dez",      "PAC 12345678 2020.02", "Outros",       60, 0.65, 234.0,   1.0,  2.0,  3.0,  6.0,  50.0,  20.0, "PERD2", "Entrada de insumo"),
      ("Saldo X", 2023, 1, "jan",  "PAC 12345678 2021.03", null,           40, 7.6,  117.0,   0.0,  0.0,  0.0,  0.0,  25.0,  10.0, "PERD3", "saida"),
      (null, 2024, 2, "",          "PAC 12345678 2019.04", "Saldo devedor", 66, 1.65, 351.0,  5.0,  6.0,  7.0, 18.0,  75.0,  30.0, "PERD4", "ENTRADA")
    ).toDF(
      "CNPJ Base", "Ano do Período de Apuração", "Trimestre do Período de Apuração",
      "Mês do Período de Apuração", "Período Apuração Crédito",
      "Natureza da Base de Cálculo dos Créditos", "Código de Situação Tributária (CST)",
      "Alíquota de PIS/PASEP (em percentual)", "Valor da Base de Cálculo das Contribuições",
      "Crédito vinculado à Receita Bruta Não Cumulativa: Tributada",
      "Crédito vinculado à Receita Bruta Não Cumulativa: Não Tributada",
      "Crédito vinculado à Receita Bruta Não Cumulativa: de Exportação",
      "Crédito vinculado à Receita Bruta Não Cumulativa",
      "Crédito vinculado à Receita Bruta Total",
      "Valor Total Crédito", "PER/DCOMP", "Tipo de Operação")
    df.createOrReplaceTempView("AllData")
    df
  }

  def run(q: String): DataFrame = { fixture(); GraftSql.run(spark, q.stripSuffix(";")) }

  test("corpus query 1: SELECT *") {
    assert(run("SELECT * FROM AllData").count() == 4)
  }

  test("corpus query 2: projection with double-quoted accented identifiers + LIKE") {
    val out = run(
      """SELECT
        |    "Ano do Período de Apuração",
        |    "Trimestre do Período de Apuração",
        |    "Mês do Período de Apuração",
        |    "Crédito vinculado à Receita Bruta Total"
        |FROM AllData
        |Where
        |    "Ano do Período de Apuração" = 2024
        |And
        |    "Mês do Período de Apuração" Like 'dez%'""".stripMargin)
    assert(out.count() == 1)
    assert(out.columns.length == 4)
  }

  test("corpus query 3: SELECT * EXCEPT with filters") {
    val out = run(
      """SELECT *
        |Except(
        |    "Crédito vinculado à Receita Bruta Total",
        |    "Crédito vinculado à Receita Bruta Não Cumulativa",
        |    "Mês do Período de Apuração"
        |)
        |FROM AllData
        |Where
        |    "Ano do Período de Apuração" = 2024
        |And
        |    "Trimestre do Período de Apuração" = 4
        |And
        |    "Mês do Período de Apuração" Like '%ez%'""".stripMargin)
    assert(out.count() == 2)
    assert(!out.columns.contains("Mês do Período de Apuração"))
    assert(out.columns.length == 14)
  }

  test("corpus query 4: qualified star + SUBSTR projection/filter") {
    val out = run(
      """SELECT
        |  AllData.*,
        |  SubStr("Período Apuração Crédito", 14, 4) AS Ano
        |FROM
        |  AllData
        |WHERE
        |  SubStr("Período Apuração Crédito", 14, 4) = '2019'""".stripMargin)
    assert(out.count() == 2)
    assert(out.columns.last == "Ano")
  }

  test("corpus query 5: IS NOT NULL + ILIKE + BETWEEN + ORDER BY") {
    val out = run(
      """SELECT *
        |FROM AllData
        |Where
        |    "Natureza da Base de Cálculo dos Créditos" is not null
        |And
        |    "Tipo de Operação" ILike '%entrada%'
        |And
        |    "Código de Situação Tributária (CST)" Between 50 And 66
        |ORDER BY
        |    "Código de Situação Tributária (CST)"""".stripMargin)
    val cst = out.select("Código de Situação Tributária (CST)")
    assert(cst.collect().map(_.getInt(0)).toSeq == Seq(55, 60, 66))
  }

  test("corpus query 6: CTE + EXCEPT + REPLACE + RENAME + multi-key ORDER BY") {
    val out = run(
      """WITH DadosComAno AS (
        |  SELECT
        |    *,
        |    CAST(SubStr("Período Apuração Crédito", 14, 4) AS INTEGER) AS Ano
        |  FROM AllData
        |)
        |SELECT
        |    *
        |    EXCEPT (
        |        "Valor Total Crédito"
        |    )
        |    REPLACE (
        |        SubStr("Período Apuração Crédito", 1, 11)
        |        AS "Período Apuração Crédito"
        |    )
        |    RENAME (
        |        "PER/DCOMP" AS "Pedido de Ressarcimento (PER)"
        |    )
        |FROM DadosComAno
        |WHERE Ano >= 2019
        |ORDER BY
        |  Ano ASC,
        |  "Período Apuração Crédito" ASC,
        |  "Tipo de Operação" DESC""".stripMargin)
    assert(out.count() == 4)
    assert(out.columns.contains("Pedido de Ressarcimento (PER)"))
    assert(!out.columns.contains("PER/DCOMP"))
    assert(!out.columns.contains("Valor Total Crédito"))
    // REPLACE truncated the period string to 11 chars
    assert(out.select("Período Apuração Crédito").collect()
      .forall(_.getString(0).length == 11))
  }

  test("corpus example 9: frequency GROUP BY with alias ORDER BY") {
    val out = run(
      """SELECT
        |    `Ano do Período de Apuração`,
        |    `Mês do Período de Apuração`,
        |    COUNT(*) AS Frequency
        |FROM AllData
        |GROUP BY
        |    `Ano do Período de Apuração`,
        |    `Mês do Período de Apuração`
        |ORDER BY
        |    Frequency DESC""".stripMargin)
    assert(out.count() == 4)
  }

  test("corpus example 11: SUBSTR + modulo + OR-grouped filter + '' comparison") {
    val out = run(
      """SELECT
        |    `Ano do Período de Apuração`,
        |    "Trimestre do Período de Apuração",
        |    SubStr(`Natureza da Base de Cálculo dos Créditos`,1,16),
        |    `Valor da Base de Cálculo das Contribuições` % 117
        |FROM AllData
        |WHERE
        |    `Natureza da Base de Cálculo dos Créditos` LIKE '%Saldo%'
        |AND (
        |    `Mês do Período de Apuração` = ''
        |    OR
        |    `Mês do Período de Apuração` IS NULL
        |)""".stripMargin)
    assert(out.count() == 1)
  }

  test("corpus example 12: EXCEPT + ILIKE month filter") {
    val out = run(
      """SELECT *
        |EXCEPT(
        |    `Mês do Período de Apuração`,
        |    `Crédito vinculado à Receita Bruta Não Cumulativa`,
        |    `Crédito vinculado à Receita Bruta Total`
        |)
        |FROM AllData
        |WHERE
        |    `Ano do Período de Apuração` = 2024
        |AND
        |    `Trimestre do Período de Apuração` = 4
        |AND
        |    `Mês do Período de Apuração` ILIKE '%dez%'""".stripMargin)
    assert(out.count() == 2)
    assert(out.columns.length == 14)
  }
}
