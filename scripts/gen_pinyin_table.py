#!/usr/bin/env python
"""Generate a broad Han→pinyin table from CLDR pinyin-collation data.

No pinyin *reading* database ships in this environment, but perl's
``Unicode::Collate::CJK::Pinyin`` (CLDR data, derived from Unihan readings)
ships ~21k Han characters grouped into collation lines where every line is
one (pinyin syllable, tone) group, in syllable order. Readings are not in
the file — but they can be recovered:

1. anchor lines with characters whose dominant toneless reading is known
   (the hand-curated tables below), labelling a line by the majority vote
   of its anchors;
2. interpolate: unlabeled lines strictly between two anchored lines of the
   SAME syllable must themselves be that syllable (lines are
   syllable-contiguous);
3. drop anything still ambiguous — a missing entry is a conservative miss
   in hot-word matching, a wrong one is a false replacement.

The result is written to ``light_whisper_tpu/text/pinyin_data.py`` as a
``{syllable: "chars"}`` dict. Reference behavior target: the Rust ``pinyin``
crate's per-char dominant reading (qwen_hotword_service.rs:472-477).

Run:  python scripts/gen_pinyin_table.py [--check]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

PM_PATH = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
OUT_PATH = Path(__file__).resolve().parent.parent / "light_whisper_tpu" / "text" / "pinyin_data.py"

# Hand-curated anchor readings (dominant, toneless). Only characters with an
# unambiguous dominant reading are listed; known polyphones whose collation
# reading could differ (着了还调曾差壳吓乐钥爪粘咋轧...) are deliberately
# absent. ü is romanized "v" (lv/nv), matching the builtin table's scheme.
SUPPLEMENT = {
    "a": "啊",
    "ai": "爱哎挨矮艾碍癌唉埃",
    "an": "安按暗岸案鞍氨俺",
    "ang": "昂",
    "ao": "奥傲澳熬袄凹",
    "ba": "八把爸吧拔罢霸巴疤芭笆靶坝",
    "bai": "白百摆败拜柏",
    "ban": "班般搬板版办半伴拌扮瓣斑颁",
    "bang": "帮绑榜膀棒磅镑傍蚌",
    "bao": "包胞雹保堡饱宝抱报暴爆豹鲍",
    "bei": "杯悲碑北贝备背倍被辈狈惫",
    "ben": "奔本笨",
    "beng": "崩蹦绷迸",
    "bi": "逼鼻比彼笔币必毕闭碧蔽壁避臂庇毙痹弊",
    "bian": "边编鞭扁便变遍辩辫贬卞",
    "biao": "标表",
    "bie": "别憋鳖瘪",
    "bin": "宾滨彬斌濒",
    "bing": "冰兵丙柄饼并病秉",
    "bo": "波玻菠播博搏膊伯驳泊脖舶渤跛",
    "bu": "不布步部补捕哺埠簿",
    "ca": "擦",
    "cai": "猜才材财裁采彩菜蔡睬",
    "can": "参餐残惨灿惭蚕",
    "cang": "仓苍舱藏沧",
    "cao": "操草曹槽糙",
    "ce": "册侧厕测策",
    "ceng": "层蹭",
    "cha": "插叉茶查察茬碴",
    "chai": "拆柴",
    "chan": "产铲缠禅蝉馋颤阐忏",
    "chang": "昌猖长场厂唱畅倡尝偿肠敞",
    "chao": "抄超朝潮吵炒巢嘲",
    "che": "车扯彻撤澈",
    "chen": "尘臣沉陈晨衬趁辰忱橙?".replace("橙?", ""),
    "cheng": "称撑成呈承诚城乘惩程秤橙澄逞骋",
    "chi": "吃痴池迟持匙尺齿耻斥赤翅驰炽",
    "chong": "充冲虫崇宠",
    "chou": "抽仇绸愁稠筹酬丑臭瞅",
    "chu": "初出除厨锄雏础储楚处触畜矗",
    "chuan": "川穿船传喘串",
    "chuang": "疮窗床创闯",
    "chui": "吹炊垂锤捶",
    "chun": "春纯唇蠢醇",
    "ci": "疵词慈磁雌辞此次刺赐伺",
    "cong": "聪葱从丛匆囱",
    "cou": "凑",
    "cu": "粗促醋簇",
    "cuan": "窜篡",
    "cui": "催脆翠摧崔萃粹",
    "cun": "村存寸",
    "cuo": "搓撮挫错措磋",
    "da": "搭达答打",
    "dai": "呆代带待怠贷袋逮戴歹",
    "dan": "丹单担胆旦但淡蛋弹诞氮耽",
    "dang": "当挡党荡档",
    "dao": "刀导岛倒蹈稻盗悼",
    "de": "德",
    "deng": "灯登等凳瞪邓蹬",
    "di": "低堤滴迪敌笛底抵帝递蒂缔狄涤翟嘀",
    "dian": "颠典点电店垫殿淀掂惦奠碘佃甸",
    "diao": "雕吊钓掉叼貂凋",
    "die": "爹跌叠蝶碟谍",
    "ding": "叮盯钉顶订锭定",
    "diu": "丢",
    "dong": "冬董懂冻洞栋侗",
    "dou": "兜斗抖豆逗痘",
    "du": "督毒读独堵赌杜肚镀渡妒笃",
    "duan": "端短段断锻缎",
    "dui": "堆队兑",
    "dun": "吨蹲敦顿盾钝炖囤",
    "duo": "哆夺朵躲舵惰跺堕垛",
    "e": "鹅蛾额恶饿俄扼遏讹",
    "en": "恩",
    "er": "而耳尔饵贰",
    "fa": "乏伐罚阀筏",
    "fan": "帆番翻凡烦繁反返犯饭泛范贩樊藩矾",
    "fang": "坊芳防妨房访纺放仿",
    "fei": "飞非啡菲肥匪废沸肺费诽吠",
    "fen": "吩纷芬氛坟粉奋愤粪份焚",
    "feng": "丰风枫封疯峰锋蜂缝凤奉讽俸",
    "fo": "佛",
    "fou": "否",
    "fu": "夫肤孵扶拂服俘浮符幅福抚辅腐父付妇负附咐赴副傅富腹覆赋缚甫斧芙",
    "gai": "该改盖溉概钙丐",
    "gan": "干甘杆肝赶敢感柑竿秆赣尴",
    "gang": "冈刚钢缸肛岗港杠",
    "gao": "糕搞稿告膏篙羔",
    "ge": "哥胳鸽割歌阁革格葛隔搁疙戈",
    "gei": "给",
    "gen": "根跟",
    "geng": "耕庚埂耿梗",
    "gong": "弓攻功恭供宫巩汞贡共拱躬",
    "gou": "沟钩狗构购够勾苟垢",
    "gu": "估咕孤姑古谷股骨鼓固故顾雇辜菇汩箍",
    "gua": "瓜刮挂寡卦呱",
    "guai": "乖拐怪",
    "guan": "官冠馆管贯惯灌罐观棺",
    "guang": "光广逛",
    "gui": "归龟规硅轨鬼柜贵桂跪瑰闺诡刽",
    "gun": "棍滚",
    "guo": "锅郭裹",
    "ha": "哈",
    "hai": "孩骸害氦亥骇",
    "han": "含函寒罕喊汉汗旱焊憾撼翰酣韩涵捍悍",
    "hang": "航杭",
    "hao": "蒿毫豪耗浩壕号嚎",
    "he": "喝禾核荷盒贺褐鹤赫阂涸",
    "hei": "黑嘿",
    "hen": "痕狠恨",
    "heng": "哼恒横衡",
    "hong": "轰哄烘红宏洪虹鸿",
    "hou": "喉猴吼厚候侯",
    "hu": "乎呼忽湖糊虎互户护弧狐胡壶葫蝴浒沪唬",
    "hua": "花划华滑猾画哗桦",
    "huai": "怀徊坏淮槐",
    "huan": "欢环缓幻唤换患焕痪宦涣",
    "huang": "荒慌皇黄煌晃谎凰惶蝗磺恍",
    "hui": "灰恢挥辉徽毁悔慧惠晦贿讳诲绘烩",
    "hun": "昏婚浑魂混荤",
    "huo": "活火伙货获祸豁惑霍",
    "ji": "肌饥圾机激鸡积基绩及级极即急疾集籍吉挤几脊技冀季祭剂悸济寄寂纪忌际妓继既箕讥叽嫉蓟鲫",
    "jia": "佳嘉夹枷甲贾钾价驾嫁稼假架颊迦伽",
    "jian": "尖坚歼间肩艰兼监减剪检简见件建剑荐贱健舰渐践鉴键箭俭碱茧奸缄",
    "jiang": "江姜将浆僵疆讲奖桨匠酱降蒋",
    "jiao": "交郊浇娇骄胶椒焦蕉角狡绞饺脚搅缴叫轿较教酵娇礁蛟跤",
    "jie": "阶皆接揭街节劫杰洁结捷截姐解介戒届界借诫藉",
    "jin": "巾斤金今津筋仅紧锦尽劲近进晋浸禁襟谨",
    "jing": "京经茎惊晶睛精井景警净径竟竞敬境静镜荆兢颈痉",
    "jiong": "窘",
    "jiu": "纠究揪九久酒旧救就舅灸玖韭厩",
    "ju": "居驹鞠局菊橘举矩句巨拒具俱剧惧据距聚拘炬锯沮咀",
    "juan": "捐鹃卷倦绢眷娟",
    "jue": "决诀绝掘嚼爵倔崛",
    "jun": "均菌俊郡骏峻竣",
    "ka": "咖卡",
    "kai": "凯慨楷",
    "kan": "刊堪砍坎侃瞰",
    "kang": "康慷糠扛抗炕亢",
    "kao": "考拷烤靠铐",
    "ke": "科棵颗咳可渴克刻客课苛柯磕坷恪",
    "ken": "肯恳啃垦",
    "keng": "坑",
    "kong": "空孔恐控",
    "kou": "口扣寇叩",
    "ku": "枯哭窟苦库裤酷",
    "kua": "夸垮挎跨胯",
    "kuai": "快块筷侩",
    "kuan": "宽款",
    "kuang": "筐狂框矿眶旷况匡",
    "kui": "亏愧葵魁馈溃窥",
    "kun": "昆捆困坤",
    "kuo": "括阔扩廓",
    "la": "拉啦喇蜡辣腊",
    "lai": "来赖莱",
    "lan": "兰拦栏婪懒烂滥蓝篮览揽缆榄澜",
    "lang": "郎狼廊朗浪琅榔",
    "lao": "捞劳牢姥涝烙唠",
    "le": "勒",
    "lei": "雷镭蕾泪类累擂垒磊",
    "leng": "冷愣棱",
    "li": "厘梨狸离璃黎礼李栗丽厉励例莉荔粒沥历利力立里理鲤吏隶俐痢莅",
    "lia": "俩",
    "lian": "连帘怜涟莲联廉脸练炼恋链镰敛",
    "liang": "良凉梁粮粱亮谅晾量辆俩?".replace("俩?", ""),
    "liao": "辽疗聊僚燎料镣廖撩缭",
    "lie": "列劣烈猎裂咧",
    "lin": "邻林临淋磷鳞凛吝赁琳霖",
    "ling": "伶灵岭铃陵零龄领令另凌玲菱",
    "liu": "溜刘流留榴柳六瘤硫",
    "long": "龙笼聋隆垄拢珑胧",
    "lou": "楼娄搂漏陋",
    "lu": "卢芦炉鲁陆录鹿碌路赂庐鲈麓",
    "lv": "驴吕旅铝屡缕虑滤绿氯律履",
    "luan": "乱卵峦",
    "lun": "抡轮伦仑沦纶论",
    "luo": "萝螺罗逻锣箩骡裸洛骆络落",
    "ma": "妈麻马玛码蚂骂吗嘛",
    "mai": "埋买迈麦卖脉",
    "man": "蛮馒瞒满慢漫谩蔓曼",
    "mang": "忙芒盲茫莽",
    "mao": "猫毛矛茅锚冒贸帽貌茂卯耄",
    "mei": "眉梅媒煤霉每妹媚昧魅玫枚酶镁",
    "men": "闷们",
    "meng": "蒙萌盟猛梦孟锰檬",
    "mi": "眯弥迷谜米觅蜜密秘幂靡谧",
    "mian": "棉眠免勉娩缅面冕绵",
    "miao": "苗描瞄藐秒妙庙渺缪",
    "mie": "灭蔑",
    "min": "敏悯闽皿泯",
    "ming": "鸣铭命冥茗",
    "miu": "谬",
    "mo": "摸摹蘑模膜磨摩魔抹末莫墨默沫漠寞陌茉",
    "mou": "谋牟某",
    "mu": "拇牡亩姆母墓暮幕募慕木目睦牧穆沐",
    "na": "拿哪纳娜钠呐捺",
    "nai": "氖乃奶耐奈",
    "nan": "南男难楠",
    "nao": "挠脑恼闹淖",
    "ne": "呢",
    "nei": "馁",
    "nen": "嫩",
    "ni": "妮霓倪泥尼拟你匿腻逆溺妮昵",
    "nian": "蔫拈年碾撵捻念粘?".replace("粘?", ""),
    "niang": "娘酿",
    "niao": "鸟尿",
    "nie": "捏聂孽镊镍涅",
    "nin": "您",
    "ning": "柠狞凝宁拧泞",
    "niu": "牛扭钮纽妞",
    "nong": "脓浓农弄",
    "nu": "奴努怒",
    "nv": "女",
    "nuan": "暖",
    "nuo": "挪懦糯诺",
    "o": "哦",
    "ou": "欧鸥殴藕呕偶",
    "pa": "趴爬帕怕琶啪",
    "pai": "拍排牌徘湃派",
    "pan": "攀潘盘磐盼畔判叛",
    "pang": "乓庞旁耪胖螃",
    "pao": "抛咆刨炮袍跑泡",
    "pei": "呸胚培裴赔陪配佩沛",
    "pen": "喷盆",
    "peng": "砰抨烹澎彭蓬棚硼篷膨朋鹏捧碰",
    "pi": "坯砒霹批披劈琵毗啤脾疲皮匹痞僻屁譬辟",
    "pian": "篇偏片骗翩",
    "piao": "飘漂瓢票",
    "pie": "撇瞥",
    "pin": "拼频贫品聘",
    "ping": "乒坪苹萍平凭瓶评屏",
    "po": "坡泼颇婆破魄迫粕",
    "pou": "剖",
    "pu": "扑铺仆莆葡菩蒲埔朴圃普浦谱曝瀑",
    "qi": "期欺栖戚妻七凄漆柒沏其棋奇歧畦崎脐齐旗祈祁骑起岂乞企启契砌器气迄弃汽泣讫萋",
    "qia": "掐恰洽",
    "qian": "牵扦钎铅千迁签仟谦乾黔钱钳前潜遣浅谴堑嵌欠歉",
    "qiang": "枪呛腔羌墙蔷强抢",
    "qiao": "橇锹敲悄桥瞧乔侨巧鞘撬翘峭俏窍",
    "qie": "切茄且怯窃",
    "qin": "钦侵亲秦琴勤芹擒禽寝",
    "qing": "青轻氢倾卿清擎晴氰情顷请庆",
    "qiong": "琼穷",
    "qiu": "秋丘邱球求囚酋泅",
    "qu": "趋区蛆曲躯屈驱渠取娶龋趣去",
    "quan": "圈颧权醛泉全痊拳犬券劝",
    "que": "缺炔瘸却鹊榷确雀",
    "qun": "裙群",
    "ran": "燃冉染",
    "rang": "瓤壤攘嚷让",
    "rao": "饶扰绕",
    "re": "惹热",
    "ren": "壬仁忍韧刃认任纫",
    "reng": "扔仍",
    "rong": "戎茸蓉荣融熔溶容绒冗",
    "rou": "揉柔肉",
    "ru": "茹蠕儒孺如辱乳汝入褥",
    "ruan": "软阮",
    "rui": "蕊瑞锐",
    "run": "闰润",
    "ruo": "若弱",
    "sa": "撒洒萨",
    "sai": "腮鳃赛",
    "san": "三叁伞散",
    "sang": "桑嗓丧",
    "sao": "搔骚扫嫂",
    "se": "瑟色涩",
    "sen": "森",
    "seng": "僧",
    "sha": "莎砂杀沙纱傻啥煞",
    "shai": "筛晒",
    "shan": "珊苫杉山删煽衫闪陕擅赡膳善汕扇缮",
    "shang": "墒伤商赏晌上尚",
    "shao": "梢捎稍烧芍勺韶少哨邵绍",
    "she": "奢赊蛇舌舍赦摄射慑涉社设",
    "shen": "砷申呻伸身深娠绅神沈审婶甚肾慎渗",
    "sheng": "声牲升绳省盛剩胜圣",
    "shi": "师失狮施湿诗尸虱十石拾时食蚀实识史矢使屎驶始式示士世柿事拭誓逝势是嗜噬适仕侍释饰氏市恃室视试",
    "shou": "收瘦兽守首售受授寿",
    "shu": "书殊抒输叔舒淑疏梳竖墅庶数漱恕刷述术束树黍鼠属署蜀薯暑曙熟",
    "shua": "耍",
    "shuai": "摔衰甩帅",
    "shuan": "栓拴",
    "shuang": "霜双爽",
    "shui": "谁税睡",
    "shun": "吮瞬顺舜",
    "shuo": "说硕朔烁",
    "si": "斯撕嘶思私司丝死肆寺嗣四饲巳",
    "song": "松耸怂颂送宋讼诵",
    "sou": "搜艘擞嗽",
    "su": "苏酥俗素速粟塑溯宿诉肃",
    "suan": "酸蒜算",
    "sui": "虽隋随绥髓碎岁穗遂隧祟",
    "sun": "孙损笋",
    "suo": "蓑梭唆缩琐索锁所",
    "ta": "塌他它她塔獭挞蹋踏",
    "tai": "胎苔抬台泰酞太态汰",
    "tan": "坍摊贪瘫滩坛檀痰潭谭谈坦毯袒碳探叹炭",
    "tang": "汤塘搪堂棠膛唐糖躺淌趟烫",
    "tao": "掏涛滔绦萄桃逃淘陶讨套",
    "teng": "藤腾疼誊",
    "ti": "梯剔踢锑提题蹄啼替嚏惕涕剃屉",
    "tian": "添填田甜恬舔腆",
    "tiao": "挑条迢眺跳",
    "tie": "贴铁帖",
    "ting": "厅听烃汀廷停亭庭挺艇",
    "tong": "桐酮瞳铜彤童桶捅筒痛",
    "tou": "偷投透",
    "tu": "凸秃突图徒途涂屠土吐兔",
    "tuan": "湍团",
    "tui": "推颓腿蜕褪退",
    "tun": "吞屯臀",
    "tuo": "拖托脱鸵陀驮驼椭妥拓唾",
    "wa": "挖哇蛙洼娃瓦袜",
    "wai": "歪",
    "wan": "豌弯湾玩顽丸烷完碗挽晚皖惋宛婉万腕",
    "wang": "汪王亡枉网往旺望忘妄",
    "wei": "威巍微危韦违桅围唯惟为潍维苇萎委伟伪尾纬未蔚味畏胃喂魏位渭谓尉慰卫",
    "wen": "瘟温蚊吻紊稳纹",
    "weng": "嗡翁瓮",
    "wo": "蜗涡窝卧握沃",
    "wu": "巫呜钨乌污诬屋五伍午舞侮坞戊雾晤物勿务悟误兀",
    "xi": "昔熙析西硒矽晰嘻吸锡牺稀息希悉膝夕惜熄烯溪汐犀檄袭席习媳喜铣洗系隙戏细",
    "xia": "瞎虾匣霞辖暇峡侠狭夏厦",
    "xian": "锨掀先仙鲜纤咸贤衔舷闲涎弦嫌显险现献县腺馅羡宪陷限线",
    "xiang": "香箱襄湘乡翔祥详想响享项巷橡像",
    "xiao": "萧硝霄削哮嚣销消宵淆晓孝笑效",
    "xie": "楔些歇蝎鞋协挟携邪斜胁谐写械卸蟹懈泄泻谢屑",
    "xin": "薪芯锌欣新忻",
    "xing": "星腥猩惺兴刑型形邢醒幸杏姓",
    "xiong": "兄凶胸匈汹雄熊",
    "xiu": "休修羞朽嗅锈秀袖绣",
    "xu": "墟戌需虚嘘须徐许蓄酗叙旭序恤絮婿绪续",
    "xuan": "轩喧宣悬旋玄选癣眩绚",
    "xue": "靴薛穴雪血",
    "xun": "勋熏循旬询寻驯巡殉汛训讯逊迅",
    "ya": "压押鸦鸭呀丫芽牙蚜崖衙涯雅哑亚讶",
    "yan": "焉咽阉烟淹盐严研蜒岩延言颜阎炎沿奄掩眼衍演艳堰燕厌砚雁唁彦焰宴谚验",
    "yang": "殃央鸯秧杨扬佯疡羊洋阳氧仰痒养",
    "yao": "邀腰妖瑶摇尧遥窑谣姚咬舀药要耀",
    "ye": "椰噎耶爷野冶也页掖业叶曳腋夜液",
    "yi": "壹医揖铱依伊衣颐夷遗移仪胰疑沂宜姨彝椅蚁倚乙矣亿役臆逸肄疫亦裔意毅忆义益溢诣议谊译异翼翌绎",
    "yin": "茵荫姻吟银淫寅饮引隐印",
    "ying": "英樱婴鹰应缨莹萤营荧蝇迎赢盈影颖硬映",
    "yo": "哟",
    "yong": "拥佣臃痈庸雍踊蛹咏泳涌永恿勇",
    "you": "幽优悠忧尤油游酉有友右佑釉诱又幼",
    "yu": "迂淤于盂榆虞愚舆余俞逾鱼愉渝渔隅予娱雨与屿禹语羽玉域芋郁吁遇喻峪御愈欲狱育誉浴寓裕预豫驭宇",
    "yuan": "鸳渊冤元垣袁原援辕园员圆猿源缘远苑愿怨院",
    "yue": "曰约越跃岳粤悦阅",
    "yun": "耘云郧匀陨允运蕴酝晕韵孕",
    "za": "匝砸杂",
    "zai": "栽哉灾宰载再",
    "zan": "咱攒暂赞",
    "zang": "赃脏葬",
    "zao": "遭糟凿藻枣早澡蚤躁噪造皂灶燥",
    "ze": "责择则泽",
    "zei": "贼",
    "zen": "怎",
    "zeng": "增憎赠",
    "zha": "扎喳渣札铡闸眨榨乍炸诈",
    "zhai": "摘斋宅窄债寨",
    "zhan": "瞻毡詹沾盏斩辗崭展蘸栈占站",
    "zhang": "樟章彰漳张掌涨杖丈帐账仗胀瘴障",
    "zhao": "招昭找沼赵照罩兆肇召",
    "zhe": "遮折哲蛰辙者锗蔗这浙",
    "zhen": "珍斟真甄砧臻贞针侦枕疹诊震振镇阵",
    "zheng": "蒸挣睁征狰争怔整拯症郑证",
    "zhi": "芝枝支吱蜘知肢脂汁织职直植殖执值侄址指止趾只旨纸志挚掷至致置帜峙智秩稚质炙痔滞治窒",
    "zhong": "钟肿仲众忠衷终",
    "zhou": "舟周州洲诌粥轴肘帚咒皱宙昼骤",
    "zhu": "珠株蛛朱猪诸诛逐竹烛煮拄瞩嘱主著柱注祝驻住助蛀贮铸筑",
    "zhua": "抓",
    "zhuan": "专砖转撰赚篆",
    "zhuang": "桩庄装妆撞壮状",
    "zhui": "椎锥追赘坠缀",
    "zhun": "谆准",
    "zhuo": "捉拙卓桌琢茁酌啄灼浊",
    "zi": "兹咨资姿滋淄孜紫仔籽滓字自渍",
    "zong": "鬃棕踪宗综总纵",
    "zou": "邹走奏揍",
    "zu": "租足卒族祖诅阻组",
    "zuan": "钻纂",
    "zui": "嘴醉罪最",
    "zun": "尊遵",
    "zuo": "昨左佐做坐座作",
}

# Characters whose DOMINANT reading differs from the reading CLDR collates
# them under — they must not anchor lines (they'd mislabel a whole group).
# Their dominant readings live in pinyin.py's _BUILTIN overlay instead:
# 谁 shéi (collated shuí), 佛 fó (collated fú, as in 仿佛), 咳 ké (collated hāi).
ANCHOR_EXCLUDE = {"谁", "佛", "咳"}

_HEX = re.compile(r"^[0-9A-Fa-f]{4,6}$")


def _order_key(syllable: str):
    """CLDR sorts ü (spelled v) as a secondary difference after u: lu < lv <
    luan. Primary-compare with v→u, tiebreak on the spelled form."""
    return (syllable.replace("v", "u"), syllable)


def parse_collation(path: str = PM_PATH):
    """Return [(letter, [line-of-codepoints, ...]), ...] from the pm DATA."""
    data = open(path, encoding="utf-8").read().split("__DATA__")[1].split("__END__")[0]
    letters, current = [], None
    for raw in data.strip().splitlines():
        tokens = raw.strip().split()
        if not tokens:
            continue
        if tokens[0].startswith("FDD0-"):
            current = []
            letters.append((chr(int(tokens[0].split("-")[1], 16)), current))
            tokens = tokens[1:]
        if current is None:
            continue
        cps = [int(t, 16) for t in tokens if _HEX.match(t)]
        if cps:
            current.append(cps)
    return letters


def build_anchor_map():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from light_whisper_tpu.text.pinyin import _BUILTIN

    anchors = dict(_BUILTIN)
    conflicts = []
    for syllable, chars in SUPPLEMENT.items():
        for ch in chars:
            if ch in anchors and anchors[ch] != syllable:
                conflicts.append((ch, anchors[ch], syllable))
            anchors.setdefault(ch, syllable)
    for ch in ANCHOR_EXCLUDE:
        anchors.pop(ch, None)
    return anchors, conflicts


def label_lines(letters, anchors):
    """Majority-vote labels, then same-syllable interpolation per letter."""
    labeled = []  # (label_or_None, [codepoints])
    disagreements = []
    for letter, lines in letters:
        labels = [None] * len(lines)
        for i, line in enumerate(lines):
            votes = Counter(
                anchors[chr(cp)] for cp in line if chr(cp) in anchors
            )
            if not votes:
                continue
            (top, top_n), *rest = votes.most_common()
            if rest and rest[0][1] == top_n:
                disagreements.append((letter, i, dict(votes)))
                continue  # tie: unlabeled
            if len(votes) > 1:
                disagreements.append((letter, i, dict(votes)))
            labels[i] = top
        anchor_idx = [i for i, lab in enumerate(labels) if lab]
        for a, b in zip(anchor_idx, anchor_idx[1:]):
            if labels[a] == labels[b]:
                for k in range(a + 1, b):
                    labels[k] = labels[a]
        labeled.extend(zip(labels, lines))
    return labeled, disagreements


def validate_labels(letters, anchors):
    """Structural checks the CLDR ordering guarantees for CORRECT labels:
    every line's label starts with its section letter, and labels are
    alphabetically non-decreasing within a letter (ü spelled v sorts after
    u exactly as CLDR sorts it). Violations point at bad anchors."""
    problems = []
    for letter, lines in letters:
        labels = [None] * len(lines)
        for i, line in enumerate(lines):
            votes = Counter(anchors[chr(cp)] for cp in line if chr(cp) in anchors)
            if not votes:
                continue
            (top, top_n), *rest = votes.most_common()
            if rest and rest[0][1] == top_n:
                continue
            labels[i] = top
        seq = [(i, lab) for i, lab in enumerate(labels) if lab]
        for i, lab in seq:
            if not lab.startswith(letter.lower()):
                problems.append(f"letter {letter} line {i}: label {lab!r} wrong initial")
        for (i, a), (j, b) in zip(seq, seq[1:]):
            if _order_key(a) > _order_key(b):
                problems.append(
                    f"letter {letter}: order violation {a!r}@{i} > {b!r}@{j}"
                )
    return problems


def build_table(labeled):
    """char→syllable, first labeled occurrence wins (dominant reading order)."""
    table = {}
    for label, line in labeled:
        if not label:
            continue
        for cp in line:
            table.setdefault(chr(cp), label)
    return table


def emit(table, out_path=OUT_PATH):
    by_syllable = {}
    for ch, syl in sorted(table.items()):
        by_syllable.setdefault(syl, []).append(ch)
    lines = [
        '"""Generated Han→pinyin data. DO NOT EDIT — regenerate with',
        "``python scripts/gen_pinyin_table.py`` (see that script for the",
        'recovery method: CLDR pinyin-collation groups anchored by curated',
        'readings). Toneless dominant reading per character; ü spelled v."""',
        "",
        "SYLLABLE_CHARS = {",
    ]
    for syl in sorted(by_syllable):
        chars = "".join(by_syllable[syl])
        lines.append(f'    "{syl}": "{chars}",')
    lines.append("}")
    lines.append("")
    out_path.write_text("\n".join(lines), encoding="utf-8")
    return len(table), len(by_syllable)


def main():
    letters = parse_collation()
    anchors, anchor_conflicts = build_anchor_map()
    for ch, a, b in anchor_conflicts:
        print(f"ANCHOR CONFLICT: {ch} builtin={a} supplement={b} (builtin wins)")
    problems = validate_labels(letters, anchors)
    for p in problems:
        print("VALIDATION:", p)
    if problems:
        sys.exit(f"{len(problems)} structural violations — fix anchors first")
    labeled, disagreements = label_lines(letters, anchors)
    for letter, i, votes in disagreements:
        print(f"line vote disagreement: letter={letter} line={i} votes={votes}")
    table = build_table(labeled)
    n_lines = len(labeled)
    n_labeled = sum(1 for lab, _ in labeled if lab)
    n_chars = sum(len(line) for _, line in labeled)
    if "--check" in sys.argv:
        print(f"lines labeled: {n_labeled}/{n_lines}; chars resolved: {len(table)}/{n_chars}")
        return
    n, s = emit(table)
    print(f"wrote {n} characters over {s} syllables "
          f"({n_labeled}/{n_lines} lines labeled) to {OUT_PATH}")


if __name__ == "__main__":
    main()
